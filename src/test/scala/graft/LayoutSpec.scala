package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Layout

/** Z-order layout contracts: the Morton bit-interleave itself, tile
  * locality (a tile is an axis-aligned square of cells), and the pruning
  * property q174 measures — a 2-D rectangle touches only its overlapping
  * tiles while a single-key layout reads everything for the off dimension.
  */
class LayoutSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def mortonOf(x: Long, y: Long): Long =
    Seq((x, y)).toDF("x", "y")
      .select(Layout.morton(col("x"), col("y"), 8).as("z"))
      .head().getLong(0)

  test("morton interleaves bits, x odd positions, y even") {
    assert(mortonOf(0L, 0L) == 0L)
    assert(mortonOf(1L, 0L) == 2L) // x bit 0 -> z bit 1
    assert(mortonOf(0L, 1L) == 1L) // y bit 0 -> z bit 0
    // x=0b011, y=0b101: z = 2 + 1 + 8 + 16 = 27
    assert(mortonOf(3L, 5L) == 27L)
    assert(mortonOf(255L, 255L) == 65535L)
  }

  test("morton is a bijection on the grid (no two cells share a code)") {
    val grid = spark.range(64).selectExpr("id div 8 as x", "id % 8 as y")
    val codes = grid.select(Layout.morton(col("x"), col("y"), 3).as("z"))
    assert(codes.distinct().count() == 64)
    assert(codes.agg(max("z")).head().getLong(0) == 63L)
  }

  test("a z-tile is one 32x32 axis-aligned square of cells") {
    // tileBits=6 over an 8-bit grid: tile = (x div 32, y div 32) block
    val cells = spark.range(256 * 4)
      .selectExpr("32 + id % 32 as x", "64 + id div 32 as y") // block x in [32,63], y in [64,95]
      .filter(col("y") < 96)
    val tiles = cells.select(Layout.zTile(col("x"), col("y"), 8, 6).as("t"))
    assert(tiles.distinct().count() == 1)
  }

  test("SQL twin reproduces the Spark morton code cell-for-cell") {
    val grid = spark.range(1024).selectExpr("id div 32 as x", "id % 32 as y")
    val mismatch = grid
      .withColumn("z_spark", Layout.morton(col("x"), col("y"), 5))
      .withColumn("z_sql", expr(
        Layout.mortonSql("x", "y", 5).replace("//", "div")))
      .filter(col("z_spark") =!= col("z_sql"))
    assert(mismatch.count() == 0)
  }

  test("rectangle pruning: z-layout bounds both dimensions, x-sort only its own") {
    val grid = spark.range(256L * 256L)
      .selectExpr("id div 256 as x", "id % 256 as y")
      .withColumn("file_z", Layout.zTile(col("x"), col("y"), 8, 6))
      .withColumn("file_x", shiftright(col("x"), 2))
    // time-band predicate (y only): x-sort opens ALL 64 files, z-layout 8 tile rows
    val band = grid.filter(col("y").between(64, 95))
    assert(band.select("file_x").distinct().count() == 64)
    assert(band.select("file_z").distinct().count() == 8)
    // aligned rectangle: exactly the one overlapping tile
    val rect = grid.filter(col("x").between(32, 63) && col("y").between(64, 95))
    assert(rect.select("file_z").distinct().count() == 1)
  }
}
