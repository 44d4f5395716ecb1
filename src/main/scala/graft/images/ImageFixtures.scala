package graft.images

import graft.fixtures.SyntheticWorld
import graft.geo.Cell
import graft.model.ImageRow

/** Deterministic image+caption fixture table (FIXTURES.md §5, BASELINE.json
  * input_hint schema). Each tile is georeferenced to a grid cell of the
  * synthetic map through its image_id ("tile_<cell>_<k>" — the analog of
  * slippy-map z/x/y tile names), so raster->vector overlay has ground truth.
  * Captions derive from image_id + the nearest stop name. */
object ImageFixtures {
  val TileW = 64
  val TileH = 64

  def caption(imageId: String, stopName: String): String =
    s"$imageId: view of $stopName"

  def tileId(cell: Long, k: Int): String = s"tile_${cell}_$k"
  def cellOfTileId(imageId: String): Long = imageId.split("_")(1).toLong

  /** One PNG + one JPEG tile per station node cell, plus `noisePerCell`
    * off-map tiles that must not be assigned to any shape. */
  /** build() as a distributed table — via parallelize, not Seq.toDF (toDF
    * would embed every PNG/JPEG byte array inside the logical plan). */
  def table(spark: org.apache.spark.sql.SparkSession, world: SyntheticWorld.World,
            res: Int, seed: Long = 42L, noiseTiles: Int = 8): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val rows = build(world, res, seed, noiseTiles)
    val slices = math.min(spark.sparkContext.defaultParallelism,
      math.max(1, rows.length / 100))
    spark.createDataset(spark.sparkContext.parallelize(rows, slices)).toDF()
  }

  def build(world: SyntheticWorld.World, res: Int, seed: Long = 42L,
            noiseTiles: Int = 8): Seq[ImageRow] = {
    // several stops can share one ~2.4 km cell: one tile pair per CELL,
    // named after the first stop in deterministic order
    val stationCells = world.stops.map { s =>
      (Cell.encode(s.lat, s.lng, res), s.name)
    }.groupBy(_._1).map { case (c, xs) => (c, xs.map(_._2).min) }
      .toSeq.sortBy(_._1)
    val onMap = stationCells.zipWithIndex.flatMap { case ((cell, stopName), i) =>
      Seq(("png", 0), ("jpeg", 1)).map { case (fmt, k) =>
        val id = tileId(cell, k)
        val px = ImageCodec.genPixels(seed ^ cell ^ k.toLong, TileW, TileH)
        val bytes = if (fmt == "png") ImageCodec.encodePng(px, TileW, TileH)
                    else ImageCodec.encodeJpeg(px, TileW, TileH)
        ImageRow(id, bytes, TileW, TileH, fmt, caption(id, stopName),
          ImageCodec.avgHash64(px, TileW, TileH))
      }
    }
    val noise = (0 until noiseTiles).map { k =>
      // cells far south of the map
      val cell = Cell.encode(-40.0 - k * 0.1, 100.0, res)
      val id = tileId(cell, k)
      val px = ImageCodec.genPixels(seed ^ cell ^ k.toLong, TileW, TileH)
      ImageRow(id, ImageCodec.encodePng(px, TileW, TileH), TileW, TileH, "png",
        caption(id, "nowhere"), ImageCodec.avgHash64(px, TileW, TileH))
    }
    onMap ++ noise
  }
}
