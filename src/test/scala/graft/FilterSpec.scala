package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.osm.{GraphBuilder, TagRule}

/** F2 `;`-list tag matching, F6 deep attribute extraction, twoway override
  * (reference semantics: OsmFilter.cpp:33-143, OsmBuilder.cpp:980-1029). */
class FilterSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("tagMatches: `;`-separated multi-value semantics") {
    val df = Seq(
      (1L, Map("route" -> "bus")),
      (2L, Map("route" -> "bus;tram")),
      (3L, Map("route" -> "tram; bus")),
      (4L, Map("route" -> "busses")), // substring must NOT match exactly
      (5L, Map("route" -> "trolleybus;train"))
    ).toDF("id", "tags")
    val plain = df.filter(GraphBuilder.tagMatches($"tags", Seq(TagRule("route", "bus"))))
      .select($"id").as[Long].collect().toSet
    assert(plain == Set(1L))
    val mult = df.filter(GraphBuilder.tagMatches($"tags",
        Seq(TagRule("route", "bus", multiValue = true))))
      .select($"id").as[Long].collect().toSet
    // 2: 'bus;...' form; 3: '; bus' form; 5: the reference's valMatches is
    // a SUBSTRING search ('trolleybus;train'.find('bus;') hits,
    // OsmFilter.cpp:133-138) — we reproduce that, warts and all; 4: plain
    // 'busses' has no separator form, no match
    assert(mult == Set(1L, 2L, 3L, 5L))
    // same semantics on the Scala-side TagRule.matches
    assert(TagRule("route", "bus", multiValue = true).matches(Map("route" -> "bus;tram")))
    assert(!TagRule("route", "bus", multiValue = true).matches(Map("route" -> "trolleybus")))
  }

  test("deepAttr: own tag wins, relation fallback, lowest rel id breaks ties") {
    val nodes = Seq(
      (10L, Map("name" -> "Own Name")),
      (11L, Map.empty[String, String]),
      (12L, Map.empty[String, String])
    ).toDF("id", "tags")
    val rels = Seq(
      (100L, Map("type" -> "public_transport", "name" -> "Area A"),
        Seq((11L, 0, "platform"), (10L, 0, "stop"))),
      (99L, Map("type" -> "public_transport", "name" -> "Area B"),
        Seq((11L, 0, "stop")))
    ).toDF("id", "tags", "m")
      .withColumn("members", expr(
        "transform(m, x -> named_struct('ref', x._1, 'mtype', x._2, 'role', x._3))"))
      .drop("m")
    val out = GraphBuilder.deepAttr(nodes, rels, mtype = 0,
      Seq(GraphBuilder.DeepAttrRule("name", fromRelation = false),
        GraphBuilder.DeepAttrRule("name", fromRelation = true)), "name")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(10L) == "Own Name")     // own tag beats relation
    assert(out(11L) == "Area B")       // two rels: lowest id (99) wins
    assert(out(12L) == null)           // no source anywhere
  }

  test("twoway rule overrides oneway in the graph build") {
    val cfg = graft.osm.OsmConfig.bus
    import graft.osm.GraphBuilder.tagMatches
    val df = Seq(
      (1L, Map("highway" -> "secondary", "oneway" -> "yes")),
      (2L, Map("highway" -> "secondary", "oneway" -> "no")),
      (3L, Map("highway" -> "secondary"))
    ).toDF("id", "tags")
    val ow = df.withColumn("oneway",
        when(tagMatches($"tags", cfg.twowayRules), lit(0))
          .when(tagMatches($"tags", cfg.onewayRules), lit(1))
          .otherwise(lit(0)))
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(ow == Map(1L -> 1, 2L -> 0, 3L -> 0))
  }
}
