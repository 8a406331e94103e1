package graft
/** Dev tool (r15): simhash head-band-key df-cap sweep. For each corpus
  * dir, geometry, and cap value, prints the banded candidate-row count
  * (join volume), confirmed hamming ≤ 2 pairs (recall vs the cap=0
  * exact set), hot-key count at that cap, and wall seconds — the
  * measured form of the SimhashBandDfCap recall/cost trade. Results go
  * in BASELINE.md next to the round-15 ×64 probe table.
  *
  * Usage: runMain graft.CapProbe <dir> [bandsxwidth ...] -- <cap ...>
  * Defaults: 4x16 3x20 geometries, caps 0 100 1000 10000.
  */
object CapProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkFixture.spark
    import org.apache.spark.sql.functions._
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val (geoArgs, capArgs) = args.drop(1).span(_ != "--")
    val geos = (if (geoArgs.nonEmpty) geoArgs.toSeq
      else Seq("4x16", "3x20")).map { g =>
      val Array(b, w) = g.split("x"); (b.toInt, w.toInt)
    }
    val caps = (if (capArgs.length > 1) capArgs.drop(1).toSeq
      else Seq("0", "100", "1000", "10000")).map(_.toLong)
    val sig = operators.Dedup.simhashDS(s, dir).persist()
    println(s"[capprobe] $dir docs=${sig.count()}")
    for ((bands, width) <- geos; cap <- caps) {
      val t0 = System.nanoTime()
      val rows = operators.Dedup.simhashBandedCands(sig, bands, width, cap).count()
      val pairs = operators.Dedup.simhashBandPairs(sig, bands, width, cap).count()
      val secs = (System.nanoTime() - t0) / 1e9
      val hot = if (cap <= 0) 0L else {
        val mask = (1L << width) - 1
        sig.select(explode(expr(s"sequence(0, ${bands - 1})")).as("band"),
            col("simhash"))
          .select(col("band"),
            expr(s"shiftright(simhash, CAST(band * $width AS INT)) & $mask").as("bkey"))
          .groupBy(col("band"), col("bkey")).count()
          .filter(col("count") > cap).count()
      }
      println(f"[capprobe] ${bands}x$width cap=$cap%d band_rows=$rows%d pairs=$pairs%d hot_keys=$hot%d wall=$secs%.1f s")
    }
    s.catalog.clearCache()
  }
}
