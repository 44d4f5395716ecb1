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
    * off-map tiles that must not be assigned to any shape.
    *
    * Distributed generation: only the LIGHT seeds (cell, stop name, k, fmt —
    * a few dozen bytes each) leave the driver; the pixel synthesis + PNG/JPEG
    * encoding runs on the executors. The earlier driver-side build shipped
    * every encoded byte array through parallelize task data (~100+ MB at the
    * scaling world) and serialized the whole encode behind one driver core. */
  def table(spark: org.apache.spark.sql.SparkSession, world: SyntheticWorld.World,
            res: Int, seed: Long = 42L, noiseTiles: Int = 8): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val seeds = tileSeeds(world, res, noiseTiles)
    val slices = math.max(1, math.min(spark.sparkContext.defaultParallelism * 2,
      seeds.length / 64))
    spark.createDataset(spark.sparkContext.parallelize(seeds, slices)
      .map { case (cell, stopName, k, fmt) => genRow(cell, stopName, k, fmt, seed) })
      .toDF()
  }

  /** (cell, stopName, k, fmt) per tile — the driver-resident part. */
  private def tileSeeds(world: SyntheticWorld.World, res: Int,
                        noiseTiles: Int): Array[(Long, String, Int, String)] = {
    val stationCells = world.stops.map { s =>
      (Cell.encode(s.lat, s.lng, res), s.name)
    }.groupBy(_._1).map { case (c, xs) => (c, xs.map(_._2).min) }
      .toSeq.sortBy(_._1)
    val onMap = stationCells.flatMap { case (cell, stopName) =>
      Seq((cell, stopName, 0, "png"), (cell, stopName, 1, "jpeg"))
    }
    val noise = (0 until noiseTiles).map { k =>
      (Cell.encode(-40.0 - k * 0.1, 100.0, res), "nowhere", k, "png")
    }
    (onMap ++ noise).toArray
  }

  private def genRow(cell: Long, stopName: String, k: Int, fmt: String,
                     seed: Long): ImageRow = {
    val id = tileId(cell, k)
    val px = ImageCodec.genPixels(seed ^ cell ^ k.toLong, TileW, TileH)
    val bytes = if (fmt == "png") ImageCodec.encodePng(px, TileW, TileH)
                else ImageCodec.encodeJpeg(px, TileW, TileH)
    ImageRow(id, bytes, TileW, TileH, fmt, caption(id, stopName),
      ImageCodec.avgHash64(px, TileW, TileH))
  }

  /** Driver-side build for tests/small fixtures — identical rows (values
    * AND order) to table(): both derive from tileSeeds + genRow, so the
    * committed VALUES goldens hold for either path. Several stops can share
    * one ~2.4 km cell: one tile pair per CELL, named after the first stop
    * in deterministic order; noise cells sit far south of the map. */
  def build(world: SyntheticWorld.World, res: Int, seed: Long = 42L,
            noiseTiles: Int = 8): Seq[ImageRow] =
    tileSeeds(world, res, noiseTiles).toSeq.map { case (cell, stopName, k, fmt) =>
      genRow(cell, stopName, k, fmt, seed)
    }
}
