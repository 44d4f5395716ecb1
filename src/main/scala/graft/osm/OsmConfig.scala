package graft.osm

/** Keep/level/oneway rule config — the engine analog of the reference's
  * per-MOT OsmReadOpts built from pfaedle.cfg
  * (/root/reference/src/pfaedle/osm/OsmFilter.cpp:33-143 semantics: k=v rules,
  * `*` wildcard value, `;`-separated multi-value match, first-matching
  * level filter of 8 levels). Values are our own defaults, not copied from
  * the reference config. */
case class TagRule(key: String, value: String, multiValue: Boolean = false) {
  // value "*" = any; multiValue matches inside `;`-separated lists with the
  // reference's exact separator forms (OsmFilter.cpp:129-142 valMatches)
  def matches(tags: Map[String, String]): Boolean =
    tags.get(key).exists { v =>
      value == "*" || v == value ||
        (multiValue && (v.contains(";" + value) || v.contains(value + ";") ||
          v.contains("; " + value) || v.contains(value + " ;")))
    }
}

case class OsmConfig(
    /** ways kept iff any rule matches (F2) */
    keepWays: Seq[TagRule],
    /** ordered level classifier: first match wins -> lvl 0..7 (F3) */
    levelRules: Seq[(TagRule, Int)],
    /** km/h per level, used for edge cost (G8 writeGeoms+cost) */
    levelSpeedsKmh: Array[Double],
    /** oneway predicates (F4); twoway overrides both (OsmFilter.cpp:55-64) */
    onewayRules: Seq[TagRule],
    onewayRevRules: Seq[TagRule],
    twowayRules: Seq[TagRule] = Seq(TagRule("oneway", "no"),
      TagRule("oneway", "false"), TagRule("oneway", "0")),
    /** station node predicate (F4) */
    stationRules: Seq[TagRule],
    /** turn-cycle nodes: no full-turn/restriction cost there
      * (Weights.cpp:125), never contracted through (OsmBuilder.cpp:1594) */
    turnCycleRules: Seq[TagRule] = Seq(TagRule("junction", "roundabout"),
      TagRule("highway", "turning_circle"), TagRule("highway", "mini_roundabout")),
    /** nohup nodes: ways meeting there do NOT interconnect — each way gets
      * its own node copy (OsmBuilder.cpp:680-683 multiNodes) */
    nohupRules: Seq[TagRule] = Seq.empty,
    /** station-snap blocker nodes (F4): gates/bollards etc. near a
      * projected snap point VETO the snap (reference stationBlockerFilter,
      * OsmFilter.cpp:72-74 + BlockSearch, OsmBuilder.h:66-71) */
    stationBlockerRules: Seq[TagRule] = Seq.empty,
    /** orphan OSM-station -> edge snap distance, meters (reference
      * maxOsmStationDistances default 15, MotConfigReader.cpp:273-278) */
    maxOsmStationDistanceM: Double = 15.0,
    /** max edge level a station may snap to (cfg osm_max_snap_level) */
    maxSnapLevel: Int = 7,
    /** blocker search radius around a snap point (reference default:
      * max(maxOsmStationDistances)/8, MotConfigReader.cpp:280-288) */
    maxBlockDistanceM: Double = 15.0 / 8.0,
    /** max stop->edge snap distance, meters (cfg max_snap_distance) */
    maxSnapDistanceM: Double = 300.0,
    /** grid resolution for the cell index (~2.4 km at 12, matches the
      * reference's 2000 m grid) */
    cellRes: Int = 12,
    /** bbox padding around the feed, meters (cfg bbox padding) */
    bboxPaddingM: Double = 2500.0,
    /** full-turn penalty seconds + angle (Weights.cpp:136-155 semantics) */
    fullTurnPenaltySec: Double = 30.0,
    fullTurnAngleDeg: Double = 58.0,
    /** penalty factor applied to snap distance (emission weight k) */
    distPenFactor: Double = 1.0,
    /** non-station-candidate penalty seconds */
    nonStationPenaltySec: Double = 10.0,
    /** OSM tags holding a station node's track/platform number, first
      * match wins (reference osm_track_number_tags -> statAttrRules
      * .platformRule, MotConfigReader.cpp:210-216) */
    platformTagKeys: Seq[String] = Seq("local_ref", "ref"),
    /** extra penalty seconds on station candidates whose normalized track
      * differs from the stop's platform_code (reference
      * routing_platform_unmatched_penalty, pfaedle.cfg:397-398; NOTE the
      * reference's ShapeBuilder.cpp:216-219 adds the penalty when tracks
      * EQUAL — we implement the documented intent, penalizing the
      * mismatch) */
    platformUnmatchedPenaltySec: Double = 15.0,
    /** parity switch for the above: when true, reproduce the reference's
      * LITERAL behavior (ShapeBuilder.cpp:216-219 adds the penalty when
      * track == platform_code — the opposite of the documented intent) so
      * output comparisons against upstream remain possible on feeds with
      * platform codes; default keeps the intent-correct mismatch penalty */
    emulateReferenceTrackPenalty: Boolean = false,
    /** transition-weight scale: hop cost enters the Viterbi DAG as
      * transitionPenalty * cost (ExpoTransWeight, Weights.cpp:175-181);
      * 1.0 = raw deciseconds */
    transitionPenalty: Double = 1.0,
    /** transition-weight model: "expo" | "normdistr" | "distdiff"
      * (routing_transition_method, Weights.h:25-156) */
    transWeightModel: String = "expo",
    /** Douglas-Peucker epsilon for output shape geometry, meters
      * (ShapeBuilder.cpp:1126 applies 0.5 m before writing); 0 disables */
    simplifyEpsM: Double = 0.5,
    /** extra cost share on edges whose transit lines do NOT match the
      * trip's line (G2 line-unmatched factors, Weights.cpp:65-155) */
    lineUnmatchedPenaltyFactor: Double = 0.5,
    /** G2 from/to factor split (Weights.cpp:93-118): extra cost share when
      * the edge line's from/to string does not match the trip's first/last
      * stop name (name-only statsimi, jaccard > 0.45) */
    lineFromUnmatchedPenaltyFactor: Double = 0.2,
    lineToUnmatchedPenaltyFactor: Double = 0.2,
    /** U1 config-driven normalizer chains (pfaedle.cfg:15-160 shape;
      * trgraph/Normalizer.cpp:40-58 semantics: ordered case-insensitive
      * (pattern, replacement) regex rules + lowercase). One chain per
      * attribute class. */
    stationNormRules: Seq[(String, String)] = OsmConfig.DefaultStationNormRules,
    lineNormRules: Seq[(String, String)] = OsmConfig.DefaultLineNormRules,
    trackNormRules: Seq[(String, String)] = OsmConfig.DefaultTrackNormRules,
    idNormRules: Seq[(String, String)] = Seq.empty) {

  /** compiled chains (shared per config instance) */
  @transient lazy val stationNorm = new graft.functions.StringSim.Normalizer(stationNormRules)
  @transient lazy val lineNorm = new graft.functions.StringSim.Normalizer(lineNormRules)
  @transient lazy val trackNorm = new graft.functions.StringSim.Normalizer(trackNormRules)
  @transient lazy val idNorm = new graft.functions.StringSim.Normalizer(idNormRules)

  /** 64-bit FNV-1a over the routing-relevant fields — folded into hop-memo
    * keys so the same graph under a changed config never reuses
    * wrongly-shaped cached costs. */
  lazy val fingerprint: Long = {
    val s = Seq(maxSnapDistanceM, cellRes, fullTurnPenaltySec, fullTurnAngleDeg,
      distPenFactor, nonStationPenaltySec, transitionPenalty, transWeightModel,
      lineUnmatchedPenaltyFactor, levelSpeedsKmh.mkString(","),
      maxOsmStationDistanceM, maxSnapLevel, maxBlockDistanceM,
      stationBlockerRules.mkString(","),
      platformTagKeys.mkString(","), platformUnmatchedPenaltySec,
      emulateReferenceTrackPenalty,
      lineFromUnmatchedPenaltyFactor, lineToUnmatchedPenaltyFactor,
      (stationNormRules ++ lineNormRules ++ trackNormRules ++ idNormRules)
        .mkString(",")).mkString("|")
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h = (h ^ s.charAt(i)) * 0x100000001b3L; i += 1 }
    h
  }
}

object OsmConfig {
  /** default normalizer chains (our own rules, reference-shaped:
    * pfaedle.cfg station_normalzer/line_normalzer defaults) */
  val DefaultStationNormRules: Seq[(String, String)] = Seq(
    "\\(.*\\)" -> "",
    "\\bstr\\." -> "strasse",
    "\\bst\\." -> "station",
    "\\bbhf\\b\\.?" -> "bahnhof",
    "[,;/]" -> " ",
    "\\s+" -> " ")
  val DefaultLineNormRules: Seq[(String, String)] = Seq(
    "\\bline\\b" -> "", "\\blinie\\b" -> "", "\\bbus\\b" -> "",
    "\\s+" -> " ")
  /** track/platform: keep the trailing alphanumeric token ("Gleis 4" -> "4") */
  val DefaultTrackNormRules: Seq[(String, String)] = Seq(
    "^.*?([0-9]+[a-z]?)\\s*$" -> "$1")

  /** Bus-profile defaults (our own vocabulary, reference-like shape). */
  val bus: OsmConfig = OsmConfig(
    keepWays = Seq(TagRule("highway", "motorway"), TagRule("highway", "trunk"),
      TagRule("highway", "primary"), TagRule("highway", "secondary"),
      TagRule("highway", "tertiary"), TagRule("highway", "unclassified"),
      TagRule("highway", "residential"), TagRule("highway", "service"),
      TagRule("highway", "living_street")),
    levelRules = Seq(
      TagRule("highway", "motorway") -> 0, TagRule("highway", "trunk") -> 1,
      TagRule("highway", "primary") -> 2, TagRule("highway", "secondary") -> 3,
      TagRule("highway", "tertiary") -> 4, TagRule("highway", "unclassified") -> 5,
      TagRule("highway", "residential") -> 5, TagRule("highway", "service") -> 6,
      TagRule("highway", "living_street") -> 7),
    levelSpeedsKmh = Array(85, 70, 55, 40, 30, 20, 10, 5),
    onewayRules = Seq(TagRule("oneway", "yes"), TagRule("oneway", "true"), TagRule("oneway", "1")),
    onewayRevRules = Seq(TagRule("oneway", "-1"), TagRule("oneway", "reverse")),
    stationRules = Seq(TagRule("public_transport", "stop_position"),
      TagRule("highway", "bus_stop")))

  /** O5 multi-MOT filter merge — the OsmFilter::merge analog
    * (/root/reference/src/pfaedle/osm/OsmFilter.cpp:188-201, applied per
    * read at OsmBuilder.cpp:235-238): union of the rule-sets of several
    * MOT configs. The merged config drives the SHARED raw-OSM scan (and
    * the S6/S7 filtered-OSM writers); each MOT still classifies levels
    * and speeds with its OWN config (GraphBuilder.buildShared). */
  def mergeForGraph(cfgs: Seq[OsmConfig]): OsmConfig = {
    require(cfgs.nonEmpty)
    def uni[T](f: OsmConfig => Seq[T]): Seq[T] = cfgs.flatMap(f).distinct
    cfgs.head.copy(
      keepWays = uni(_.keepWays),
      levelRules = uni(_.levelRules),
      onewayRules = uni(_.onewayRules),
      onewayRevRules = uni(_.onewayRevRules),
      twowayRules = uni(_.twowayRules),
      stationRules = uni(_.stationRules),
      turnCycleRules = uni(_.turnCycleRules),
      nohupRules = uni(_.nohupRules),
      stationBlockerRules = uni(_.stationBlockerRules),
      platformTagKeys = uni(_.platformTagKeys),
      // scan-only: per-MOT speeds stay with each MOT's own config
      levelSpeedsKmh = cfgs.map(_.levelSpeedsKmh).maxBy(_.max),
      maxSnapDistanceM = cfgs.map(_.maxSnapDistanceM).max,
      maxOsmStationDistanceM = cfgs.map(_.maxOsmStationDistanceM).max)
  }

  /** Rail-profile defaults. */
  val rail: OsmConfig = bus.copy(
    keepWays = Seq(TagRule("railway", "rail"), TagRule("railway", "light_rail"),
      TagRule("railway", "narrow_gauge"), TagRule("railway", "tram")),
    levelRules = Seq(TagRule("railway", "rail") -> 0, TagRule("railway", "light_rail") -> 1,
      TagRule("railway", "narrow_gauge") -> 2, TagRule("railway", "tram") -> 3),
    levelSpeedsKmh = Array(120, 90, 60, 40, 30, 20, 10, 5),
    onewayRules = Seq.empty, onewayRevRules = Seq.empty,
    stationRules = Seq(TagRule("railway", "station"), TagRule("railway", "halt"),
      TagRule("public_transport", "stop_position")))
}
