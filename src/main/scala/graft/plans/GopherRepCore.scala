package graft.plans

/** The per-document core of the Gopher REPETITION rule set (Rae et al.
  * 2021 table A1 — see `TextOps.gopherRepOf` for the full contract):
  * ONE implementation shared by the detail-emitting operator
  * (mapPartitions) and the fused boolean gate expression
  * ([[GopherRepPass]]), so the two faces cannot drift. Pure JVM,
  * engine-shared string semantics: split keeps trailing empties, trim
  * strips SPACES only (SQL trim), lowercase via Locale.ROOT. */
object GopherRepCore {

  /** Thresholds (percent) of the published rules. */
  val TopGramPct: Map[Int, Int] = Map(2 -> 20, 3 -> 18, 4 -> 16)
  val DupGramPct: Map[Int, Int] =
    Map(5 -> 15, 6 -> 14, 7 -> 13, 8 -> 12, 9 -> 11, 10 -> 10)

  /** The 13 rule names in [[flags]]' declaration order — shared by the
    * operator face and the struct expression so field order cannot
    * drift. */
  val FlagNames: Seq[String] =
    Seq("dup_line_ok", "dup_para_ok", "dup_line_char_ok",
      "dup_para_char_ok") ++ Seq(2, 3, 4).map(n => s"top${n}_ok") ++
      (5 to 10).map(n => s"dup${n}_ok")

  /** (n_lines, tok_chars, the 13 rule booleans in declaration order). */
  def flags(text: String): (Long, Long, Array[Boolean]) = {
    val lines = text.split("\n", -1)
    val paras = text.split("\n\n", -1)
    val norm = {
      var a = 0; var b = text.length
      while (a < b && text.charAt(a) == ' ') a += 1
      while (b > a && text.charAt(b - 1) == ' ') b -= 1
      text.substring(a, b).toLowerCase(java.util.Locale.ROOT)
    }
    val toks = norm.split(" ", -1)
    val tokChars = toks.iterator.map(_.length.toLong).sum
    def dupStats(vs: Array[String]): (Long, Long) = {
      val cnt = new java.util.HashMap[String, Int]()
      vs.foreach(v => cnt.merge(v, 1, Integer.sum))
      var n = 0L; var chars = 0L
      vs.foreach { v =>
        if (cnt.get(v) >= 2) { n += 1; chars += v.length }
      }
      (n, chars)
    }
    val (dupLines, dupLineChars) = dupStats(lines)
    val (dupParas, dupParaChars) = dupStats(paras)
    val lineChars = lines.iterator.map(_.length.toLong).sum
    val paraChars = paras.iterator.map(_.length.toLong).sum
    val topProd = new Array[Long](3)   // n = 2, 3, 4
    val covChars = new Array[Long](6)  // n = 5 .. 10
    var n = 2
    while (n <= 10) {
      val m = toks.length - n + 1
      if (m >= 1) {
        val cnt = new java.util.HashMap[String, Int]()
        val grams = new Array[String](m)
        var i = 0
        while (i < m) {
          val sb = new java.lang.StringBuilder
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(toks(i + j)); j += 1
          }
          val g = sb.toString
          grams(i) = g
          cnt.merge(g, 1, Integer.sum)
          i += 1
        }
        if (n <= 4) {
          var bestCnt = 0L; var bestProd = 0L
          i = 0
          while (i < m) {
            val c = cnt.get(grams(i)).toLong
            val gc = grams(i).length.toLong - (n - 1)
            val prod = c * gc
            if (c > bestCnt || (c == bestCnt && prod > bestProd)) {
              bestCnt = c; bestProd = prod
            }
            i += 1
          }
          topProd(n - 2) = bestProd
        } else {
          val covered = new Array[Boolean](toks.length)
          i = 0
          while (i < m) {
            if (cnt.get(grams(i)) >= 2) {
              var j = i; val e = i + n
              while (j < e) { covered(j) = true; j += 1 }
            }
            i += 1
          }
          var cv = 0L
          i = 0
          while (i < toks.length) {
            if (covered(i)) cv += toks(i).length
            i += 1
          }
          covChars(n - 5) = cv
        }
      }
      n += 1
    }
    val out = new Array[Boolean](13)
    out(0) = dupLines * 10 <= lines.length.toLong * 3
    out(1) = dupParas * 10 <= paras.length.toLong * 3
    out(2) = dupLineChars * 10 <= lineChars * 2
    out(3) = dupParaChars * 10 <= paraChars * 2
    var k = 2
    while (k <= 4) {
      out(2 + k) = topProd(k - 2) * 100 <= tokChars * TopGramPct(k)
      k += 1
    }
    k = 5
    while (k <= 10) {
      out(2 + k) = covChars(k - 5) * 100 <= tokChars * DupGramPct(k)
      k += 1
    }
    (lines.length.toLong, tokChars, out)
  }

  /** The AND of all thirteen rules — the gate form (called from
    * [[GopherRepPass]]'s eval AND generated code). */
  def pass(text: org.apache.spark.unsafe.types.UTF8String): Boolean = {
    if (text == null) return false
    flags(text.toString)._3.forall(identity)
  }

  /** [[flags]] as an InternalRow — the struct face (called from
    * [[GopherRepFlags]]'s eval AND generated code). NULL-SAFE by
    * construction: null text → (n_lines = 0, tok_chars = 0, all rules
    * false, rep_pass = false), matching [[pass]]'s null → false — a
    * null row must not NPE a task, and must not pass the gate. */
  def flagsRow(text: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val vals = new Array[Any](16)
    if (text == null) {
      vals(0) = 0L
      vals(1) = 0L
      var i = 2
      while (i < 16) { vals(i) = false; i += 1 }
    } else {
      val (nLines, tokChars, f) = flags(text.toString)
      vals(0) = nLines
      vals(1) = tokChars
      var i = 0
      while (i < 13) { vals(i + 2) = f(i); i += 1 }
      vals(15) = f.forall(identity)
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(vals)
  }
}
