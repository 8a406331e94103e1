package graft
/** Dev tool: dedup candidate-join scale probe (r12 verdict task 3).
  * Prints the pre-confirm candidate-pair counts of the prefix-Jaccard,
  * df-capped, and minhash band joins for each dir argument (defaults to
  * sf0.1 + the ×4/×16 probe corpora), plus wall time per corpus.
  */
object CandProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkFixture.spark
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/graft_sfx4", "/tmp/graft_sfx16")
    dirs.foreach { d =>
      val t0 = System.nanoTime()
      val m = operators.Dedup.candidateCounts(s, d)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[candprobe] $d%s ${m.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(" ")} wall=$secs%.1f s")
      s.catalog.clearCache()
    }
  }
}
