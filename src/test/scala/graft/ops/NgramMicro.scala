package graft.ops

/** Driver-side microbench of the ngram window kernels on real sf0.1-style
  * document text — compares the substring+LinkedHashSet gram formulation
  * against the window-scan kernels. Run:
  * `sbt "Test/runMain graft.ops.NgramMicro [nDocs]"`.
  * Not a correctness gate (NgramKernelSpec is); numbers are single-threaded.
  */
object NgramMicro {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(3000)
    // deterministic doc texts in the synthetic documents-table shape:
    // sentence-ish ASCII with duplicated phrases (gram-dup heavy)
    val docs = Array.tabulate(n) { i =>
      val r = new scala.util.Random(0xD0C5EEDL + i)
      val words = Array.tabulate(300)(j =>
        s"w${r.nextInt(40)}term${(i + j) % 97}")
      words.mkString(" ") + "  " + words.take(50).mkString(" ").toUpperCase
    }

    def timeIt(label: String, f: String => Long): Unit = {
      var sink = 0L
      (1 to 3).foreach { round =>
        val t0 = System.nanoTime()
        var i = 0
        while (i < docs.length) { sink += f(docs(i)); i += 1 }
        val s = (System.nanoTime() - t0) / 1e9
        println(f"$label round $round: $s%.3f s (${n / s}%.0f docs/s) sink=$sink")
      }
    }
    // equality sanity across the whole set
    docs.foreach { d =>
      require(Dedup.hashedSet(Dedup.charGrams(d, 4)).toSeq ==
        Dedup.ngramHashedSetOf(d, 4).toSeq, "hashedSet divergence")
      require(Dedup.minhashBandMins(Dedup.charGrams(d, 4), 16, 4).map(_.toSeq).toSeq ==
        Dedup.ngramBandMinsOf(d, 4, 16, 4).map(_.toSeq).toSeq, "bandMins divergence")
    }
    timeIt("bands old (charGrams set)  ",
      d => Dedup.minhashBandMins(Dedup.charGrams(d, 4), 16, 4)(0)(0))
    timeIt("bands new (window kernel)  ",
      d => Dedup.ngramBandMinsOf(d, 4, 16, 4)(0)(0))
    timeIt("set   old (charGrams set)  ",
      d => Dedup.hashedSet(Dedup.charGrams(d, 4)).length.toLong)
    timeIt("set   new (window kernel)  ",
      d => Dedup.ngramHashedSetOf(d, 4).length.toLong)
  }
}
