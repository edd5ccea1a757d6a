package graft.kg

/** Driver-side microbench of the scan kernel on real CorpusGen content —
  * compares the regex+String formulation against the hand-rolled scanner +
  * fused tokenizer-hasher. Run: `sbt "Test/runMain graft.kg.ScanMicro"`.
  * Not a correctness gate (ScanKernelSpec is); numbers are single-threaded.
  */
object ScanMicro {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val scale = CorpusGen.benchAt(2000000)
    val contents = Array.tabulate(n)(i => CorpusGen.contentOf(scale, i.toLong))

    def oldKernel(content: String): Scan.Products = {
      val annsB = Seq.newBuilder[(String, String, String)]
      val authorsB = Seq.newBuilder[String]
      val mensB = Seq.newBuilder[String]
      Scan.MarkerRe.findAllMatchIn(content).foreach { m =>
        val kind = m.group(1)
        val screen = m.group(2)
        if (m.group(3) != null) annsB += ((kind, screen, m.group(4)))
        if (kind == "author") authorsB += screen else mensB += screen
      }
      val authors = authorsB.result()
      val tok =
        if (authors.isEmpty) Seq.empty[(Long, Long)]
        else {
          val m = scala.collection.mutable.LinkedHashMap.empty[Long, Long]
          Text.tokens(content).foreach { t =>
            val h = graft.ops.Dedup.xxLane(0, t)
            m.update(h, m.getOrElse(h, 0L) + 1L)
          }
          m.toSeq
        }
      Scan.Products(annsB.result(), authors, mensB.result(), tok)
    }

    def time(label: String, f: String => Scan.Products): Unit = {
      var sink = 0L
      (1 to 3).foreach { round =>
        val t0 = System.nanoTime()
        var i = 0
        while (i < contents.length) { sink += f(contents(i)).tok.length; i += 1 }
        val s = (System.nanoTime() - t0) / 1e9
        println(f"$label round $round: $s%.2f s (${n / s}%.0f files/s) sink=$sink")
      }
    }
    // equality sanity on the first 10k
    contents.take(10000).foreach { c =>
      require(oldKernel(c) == Scan.productsOf(c), s"kernel divergence on: $c")
    }
    time("old (regex + String tokens)", oldKernel)
    time("new (scanner + fused hash) ", Scan.productsOf)
    time("old again                  ", oldKernel)
  }
}
