package graft.kg

import scala.collection.mutable

/** Single-threaded plain-Scala re-implementation of the pipeline semantics
  * (SURVEY §5 "Pipeline P/R harness"): this is the stand-in for "the
  * reference pipeline's emitted alignments" that the BASELINE.json P/R≥0.95
  * target is measured against. It shares every scalar function with the
  * Spark pipeline (Text.scala) and mirrors the Column arithmetic of
  * Scorer.score EXACTLY (including Catalyst's log(base,x) =
  * ln(x)/ln(base) form), so at small scale the triple sets must match
  * bit-for-bit, not just at P/R≥0.95.
  *
  * No Spark imports here — pure loops + mutable maps, the way the reference
  * itself computes (parallelStream driver loops, PrepareTrainingSet.java).
  */
object ScalarOracle {

  private val AnnotationRe =
    "// @(author|mention) (\\S+) \\(([^)]*)\\)".r

  final case class ScoredCand(entityId: String, accountId: Long,
      screenName: String, freq: Long, score: Double, rank: Int,
      isAlignment: Boolean)

  def run(scale: CorpusGen.Scale, conf: KgConf = KgConf()): (Set[Triple], Seq[ScoredCand]) = {
    // ---------------- accounts
    val nAcc = CorpusGen.nAccounts(scale)
    val screenToId = mutable.HashMap.empty[String, Long]
    val accById = mutable.HashMap.empty[Long, Account]
    var ai = 0L
    while (ai < nAcc) {
      val a = CorpusGen.accountRow(ai, scale)
      screenToId(a.screenName) = a.accountId
      accById(a.accountId) = a
      ai += 1
    }

    // ---------------- dictionary (Mentions.extract + Dictionary.build)
    val dict = mutable.HashMap.empty[(String, Long), Long] // (name, accId) -> freq
    var fi = 0L
    while (fi < scale.nFiles) {
      val content = CorpusGen.contentOf(scale, fi)
      AnnotationRe.findAllMatchIn(content).foreach { m =>
        val screen = m.group(2)
        val display = m.group(3)
        screenToId.get(screen).foreach { accId =>
          val name = Text.normalizeName(display)
          if (name.length >= 3)
            dict((name, accId)) = dict.getOrElse((name, accId), 0L) + 1L
        }
      }
      fi += 1
    }
    // name -> list of (accId, freq)
    val dictByName = mutable.HashMap.empty[String, mutable.ArrayBuffer[(Long, Long)]]
    dict.foreach { case ((name, acc), f) =>
      dictByName.getOrElseUpdate(name, mutable.ArrayBuffer.empty) += ((acc, f))
    }
    // band key -> distinct dictionary names (J10 blocking index)
    val dictNamesByBand = mutable.HashMap.empty[Long, mutable.ArrayBuffer[String]]
    dictByName.keysIterator.foreach { name =>
      Blocking.bandKeys(name).foreach { bk =>
        dictNamesByBand.getOrElseUpdate(bk, mutable.ArrayBuffer.empty) += name
      }
    }

    // ---------------- candidates (CandidateGen.candidates)
    def rollup(entityId: String, qnames: Seq[String]): Map[Long, Long] = {
      val m = mutable.HashMap.empty[Long, Long]
      qnames.foreach { qn =>
        dictByName.get(qn).foreach(_.foreach { case (acc, f) =>
          m(acc) = m.getOrElse(acc, 0L) + f
        })
      }
      m.toMap
    }

    val allScored = mutable.ArrayBuffer.empty[ScoredCand]
    var ei = 0L
    while (ei < scale.nEntities) {
      if (!CorpusGen.isDead(ei)) {
        val ent = CorpusGen.entityRow(ei)
        val qnames = (ent.names ++ ent.labels).iterator
          .map(Text.normalizeName)
          .flatMap(n => Iterator(n, Text.swapLastFirst(n)))
          .filter(_.length >= 3)
          .toVector.distinct.sorted
        var cands = rollup(ent.id, qnames)
        if (cands.size > conf.backoffThreshold) {
          val primary = Text.swapLastFirst(Text.normalizeName(ent.names.head))
          cands = if (primary.length >= 3) rollup(ent.id, Seq(primary)) else Map.empty
        }
        // J10 fuzzy long-tail (mirrors CandidateGen: band-key blocking +
        // exact shingle-Jaccard over DISTINCT matched dictionary names)
        if (conf.fuzzyEnabled && cands.isEmpty) {
          val matchedNames = mutable.HashSet.empty[String]
          qnames.foreach { qn =>
            Blocking.bandKeys(qn).foreach { bk =>
              dictNamesByBand.get(bk).foreach(_.foreach { dn =>
                if (Blocking.jaccardShingles(qn, dn) >= conf.fuzzyThreshold)
                  matchedNames += dn
              })
            }
          }
          val m = mutable.HashMap.empty[Long, Long]
          matchedNames.foreach { dn =>
            dictByName.get(dn).foreach(_.foreach { case (acc, f) =>
              m(acc) = m.getOrElse(acc, 0L) + f
            })
          }
          cands = m.toMap
        }
        val topK = cands.toSeq
          .sortBy { case (acc, f) => (-f, acc) }
          .take(conf.topK)

        // ---------------- scoring (mirrors Scorer.score Column arithmetic)
        val scored = topK.map { case (acc, freq) =>
          val a = accById(acc)
          val nameSim = Text.nameSimilarity(ent.names, a.name)
          val cos = Text.cosineTokens(Text.tokens(ent.abstractText), Text.tokens(a.description))
          val z = conf.wName * nameSim +
            conf.wCos * cos +
            conf.wFollowers * (math.log(a.followers.toDouble + 1.0) / math.log(10.0)) +
            conf.wFreq * (math.log(freq.toDouble + 1.0) / math.log(10.0)) +
            conf.wVerified * (if (a.verified) 1.0 else 0.0) +
            conf.bias
          val score = 1.0 / (1.0 + math.exp(-z))
          (acc, a.screenName, freq, score)
        }.sortBy { case (acc, _, _, score) => (-score, acc) }

        scored.zipWithIndex.foreach { case ((acc, sn, freq, score), idx) =>
          val second = if (idx == 0 && scored.length > 1) scored(1)._4 else 0.0
          val isAlign = idx == 0 && (score - second) > conf.margin && score > conf.minScore
          allScored += ScoredCand(ent.id, acc, sn, freq, score, idx + 1, isAlign)
        }
      }
      ei += 1
    }

    // ---------------- canonicalization (union-find over strong edges)
    val parent = mutable.HashMap.empty[String, String]
    def find(x: String): String = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    def union(a: String, b: String): Unit = {
      val ra = find(a); val rb = find(b)
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    allScored.foreach { c =>
      if (c.isAlignment && c.score >= conf.strongThreshold)
        union(c.entityId, "web:acc/" + c.screenName)
    }
    // find() returns the component min (unions always keep the smaller
    // root), or the node itself when it never joined an edge — exactly the
    // coalesce(comp, entity) semantics of Canonicalize.representatives.
    def rep(entity: String): String = find(entity)

    // ---------------- triples (mirrors Triples.materialize)
    val triples = mutable.HashSet.empty[Triple]
    allScored.foreach { c =>
      val accIri = "web:acc/" + c.screenName
      val candIri = "kb:candidate/" + c.entityId.replaceFirst("^kb:resource/", "") +
        "/" + c.accountId.toString
      if (c.isAlignment) triples += Triple(c.entityId, "foaf:account", accIri)
      triples += Triple(c.entityId, "owl:sameAs", rep(c.entityId))
      triples += Triple(c.entityId, "sl:candidate", candIri)
      triples += Triple(candIri, "sl:rank", c.rank.toString)
      triples += Triple(candIri, "sl:confidence",
        String.format(java.util.Locale.US, "%.6f", Double.box(c.score)))
      triples += Triple(candIri, "sl:account", accIri)
      triples += Triple(accIri, "dcterms:identifier", c.accountId.toString)
      triples += Triple(accIri, "foaf:accountName", c.screenName)
    }
    (triples.toSet, allScored.toSeq)
  }
}
