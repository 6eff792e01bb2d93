package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared digest loop for the text-hashing native expressions.
  *
  * Contract (oracle compatibility): shingles are CHARACTER n-grams of the
  * input (Spark `substring` semantics), hashed as their UTF-8 bytes with
  * md5 — identical to `md5(cast(substring(t, p+1, n) as binary))`. "Min
  * hash-slice" compares the lowercase-hex slice lexicographically, which
  * for fixed-width hex equals unsigned numeric order of the underlying
  * digest bytes — so minima are tracked as primitive ints/byte arrays and
  * the hex string is materialized ONCE at the end, not per shingle. The
  * HOF formulation allocates a 32-char hex string per position; at
  * corpus scale that allocation (and the interpreted lambda around it)
  * is the whole profile.
  */
object GraftHash {
  private val mdLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** md5 digest of character shingle [p, p+n) of `t`, ASCII fast path. */
  private def shingleDigest(md: MessageDigest, t: UTF8String,
                            bytes: Array[Byte], ascii: Boolean,
                            p: Int, n: Int): Array[Byte] = {
    if (ascii) md.update(bytes, p, n)
    else md.update(t.substring(p, p + n).getBytes)
    md.digest()
  }

  /** The `k` band minima of 8-hex-char md5 slices over char `nGram`-grams
    * — the MinHash signature of `DedupOps.dedupMinhash`, one pass, no
    * per-shingle allocation on ASCII text.
    *
    * One md5 (32 hex chars) yields 4 slices; slices 0-3 come from the
    * PLAIN digest — bit-compatible with the original k ≤ 4 contract and
    * its `md5(shingle)` oracle. Larger k draws ⌈k/4⌉ digests per shingle,
    * digest j > 0 salted with the single byte j (distinct, deterministic
    * hash families — the standard salted-permutation construction).
    * Production dedup configs (K=128, B=32) fit in 32 digests/shingle.
    * Returns null when the text is shorter than one shingle. */
  def minhashSlices(t: UTF8String, nGram: Int, k: Int): ArrayData = {
    require(k >= 1 && k <= 256,
      s"k=$k out of range: 1..256 (${(k + 3) / 4} salted md5 per shingle)")
    val nChars = t.numChars()
    if (nChars < nGram) return null
    val bytes = t.getBytes
    val ascii = bytes.length == nChars
    val md = mdLocal.get()
    val nDigests = (k + 3) / 4
    val mins = Array.fill(k)(0xFFFFFFFFFFFFFFFFL >>> 32) // max unsigned 32-bit
    var p = 0
    while (p <= nChars - nGram) {
      var j = 0
      while (j < nDigests) {
        if (j > 0) md.update(j.toByte) // salt BEFORE the shingle bytes
        val d = shingleDigest(md, t, bytes, ascii, p, nGram)
        var s = 0
        val lim = math.min(4, k - 4 * j)
        while (s < lim) {
          val i = 4 * j + s
          val v = ((d(4 * s) & 0xffL) << 24) | ((d(4 * s + 1) & 0xffL) << 16) |
            ((d(4 * s + 2) & 0xffL) << 8) | (d(4 * s + 3) & 0xffL)
          if (v < mins(i)) mins(i) = v
          s += 1
        }
        j += 1
      }
      p += 1
    }
    new GenericArrayData(
      mins.map(v => UTF8String.fromString(f"$v%08x"): Any))
  }

  /** The lexicographic minimum full md5 hex over char `nGram`-grams — the
    * winnowing-style fingerprint of `TextOps.fingerprint`. Minimum is
    * tracked on the 16 raw digest bytes (unsigned compare ≡ hex-string
    * order); hex is materialized once. Null below one shingle. */
  def fingerprintMin(t: UTF8String, nGram: Int): UTF8String = {
    val nChars = t.numChars()
    if (nChars < nGram) return null
    val bytes = t.getBytes
    val ascii = bytes.length == nChars
    val md = mdLocal.get()
    var min: Array[Byte] = null
    var p = 0
    while (p <= nChars - nGram) {
      val d = shingleDigest(md, t, bytes, ascii, p, nGram)
      if (min == null || unsignedLess(d, min)) min = d
      p += 1
    }
    val sb = new java.lang.StringBuilder(32)
    min.foreach(b => sb.append(f"${b & 0xff}%02x"))
    UTF8String.fromString(sb.toString)
  }

  /** DISTINCT winnowing fingerprints (Schleimer/Wilkerson/Aiken's MOSS
    * scheme): the minimum 8-hex-char md5 slice of every length-`w` window
    * of consecutive char `nGram`-gram hashes, deduplicated. Selection is
    * CONTENT-defined, so a passage shared by two documents selects the
    * same fingerprints regardless of its byte offset in either doc —
    * the alignment-robustness stride-sampled shingles lack — with the
    * classic guarantee: any common substring of length ≥ nGram + w − 1
    * shares at least one fingerprint. Only the distinct VALUE set is
    * returned (ascending), so within-window tie-breaking cannot matter
    * and the set equals the oracle's DISTINCT window-min formulation
    * exactly (fixed-width hex ≡ unsigned numeric order). Rolling min via
    * a monotonic deque — O(n) per doc, one pass, no allocation per
    * window. Null below one full window (text shorter than
    * nGram + w − 1). */
  def winnowFingerprints(t: UTF8String, nGram: Int, w: Int): ArrayData = {
    val nChars = t.numChars()
    val nPos = nChars - nGram + 1
    if (nPos < w) return null
    val bytes = t.getBytes
    val ascii = bytes.length == nChars
    val md = mdLocal.get()
    val vals = new Array[Long](nPos)
    var p = 0
    while (p < nPos) {
      val d = shingleDigest(md, t, bytes, ascii, p, nGram)
      vals(p) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      p += 1
    }
    val sel = new java.util.TreeSet[java.lang.Long]()
    val deque = new Array[Int](nPos)
    var head = 0
    var tail = 0
    var i = 0
    while (i < nPos) {
      while (tail > head && vals(deque(tail - 1)) >= vals(i)) tail -= 1
      deque(tail) = i
      tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) sel.add(vals(deque(head)))
      i += 1
    }
    val out = new Array[Any](sel.size)
    val it = sel.iterator()
    var j = 0
    while (it.hasNext) {
      out(j) = UTF8String.fromString(f"${it.next().longValue()}%08x")
      j += 1
    }
    new GenericArrayData(out)
  }

  /** DUPLICATED-RUN spans for passage EXCISION
    * (`DedupOps.substringExcise` — the deduplicate-text-datasets cut):
    * every kgram position p of `t` whose 8-hex-char md5 slice (the
    * [[winnowFingerprints]] hash — same digest, same slice) appears in
    * `fps` (the doc's FOREIGN-owned fingerprint values, computed by the
    * keyed join outside) marks chars [p, p+nGram) as duplicated;
    * overlapping marks merge into spans. A gap of exactly zero
    * (adjacent spans) stays TWO spans — the SQL islands rule
    * (`i > prev_max + nGram − 1` starts an island), replicated exactly
    * so span counts hash-match the oracle. Scanning ALL positions (not
    * just winnow-selected ones) is deliberate: every occurrence of a
    * duplicated gram in the later doc is cut, not only the selected
    * copy. Returns ascending non-overlapping (s, e) char intervals;
    * empty array when `fps` is empty or the text is shorter than one
    * gram. */
  def winnowCutSpans(t: UTF8String, fps: ArrayData, nGram: Int): ArrayData = {
    val nFps = if (fps == null) 0 else fps.numElements()
    val nChars = t.numChars()
    if (nFps == 0 || nChars < nGram) return new GenericArrayData(Array.empty[Any])
    val set = new java.util.HashSet[java.lang.Long](nFps * 2)
    var fi = 0
    while (fi < nFps) {
      // a non-hex entry cannot match any kgram hash — skip it rather
      // than throw (the expression is public surface; input contract
      // violations must not kill a job)
      try set.add(java.lang.Long.parseLong(fps.getUTF8String(fi).toString, 16))
      catch { case _: NumberFormatException => () }
      fi += 1
    }
    if (set.isEmpty) return new GenericArrayData(Array.empty[Any])
    val bytes = t.getBytes
    val ascii = bytes.length == nChars
    val md = mdLocal.get()
    val spans = scala.collection.mutable.ArrayBuffer.empty[Any]
    var curStart = -1
    var curMax = -1
    var p = 0
    while (p <= nChars - nGram) {
      val d = shingleDigest(md, t, bytes, ascii, p, nGram)
      val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      if (set.contains(v)) {
        if (curStart >= 0 && p <= curMax + nGram - 1) curMax = p
        else {
          if (curStart >= 0)
            spans += org.apache.spark.sql.catalyst.InternalRow(
              curStart, curMax + nGram)
          curStart = p; curMax = p
        }
      }
      p += 1
    }
    if (curStart >= 0)
      spans += org.apache.spark.sql.catalyst.InternalRow(curStart, curMax + nGram)
    new GenericArrayData(spans.toArray)
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  /** SimHash fingerprint over whitespace tokens in ONE pass — the
    * explode-free twin of `DedupOps.simhashFingerprints`' explode +
    * bit-sum aggregation. Token split replicates Spark
    * `split(t, " ")` exactly: single-space separators, EMPTY tokens kept
    * (incl. leading/trailing) — byte-level split on 0x20 is exact for
    * UTF-8. Weight for bit b (b < 32) is the parity of hex digit b of the
    * token's md5 (= low bit of nibble b of the digest); bits 32-63 use the
    * SECOND bit of nibble b-32, so a 64-bit fingerprint draws two
    * independent bit planes from the same digest and bits 0-31 are
    * IDENTICAL to the 32-bit fingerprint. Fingerprint bit b is set iff
    * the signed sum over tokens is positive. All-integer math —
    * bit-identical to the aggregation formulation by construction,
    * asserted in TextHashExprSpec. */
  def simhashFp(t: UTF8String, bits: Int): Long = {
    val md = mdLocal.get()
    val bytes = t.getBytes
    val n = bytes.length
    val sums = new Array[Int](bits)
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        md.update(bytes, start, i - start)
        val d = md.digest()
        var b = 0
        while (b < bits) {
          val digit = b & 31 // hex digit index; b >= 32 reuses digits 0-31
          val plane = b >>> 5 // 0: low bit of the nibble, 1: second bit
          val nib =
            if ((digit & 1) == 0) (d(digit >> 1) >> 4) & 0xf
            else d(digit >> 1) & 0xf
          sums(b) += (if (((nib >>> plane) & 1) == 1) 1 else -1)
          b += 1
        }
        start = i + 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < bits) {
      if (sums(b) > 0) fp |= 1L << b
      b += 1
    }
    fp
  }
}

/** `minhash_slices(text, nGram, k)` → array of the k band-minimum
  * 8-hex-char md5 slices (see [[GraftHash.minhashSlices]]). */
case class MinhashSlices(child: Expression, nGram: Int, k: Int = 4)
    extends UnaryExpression {
  require(k >= 1 && k <= 256,
    s"k=$k out of range: 1..256 (see GraftHash.minhashSlices)")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${other.sql}")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true // short input → null
  override def prettyName: String = "minhash_slices"

  override protected def nullSafeEval(input: Any): Any =
    GraftHash.minhashSlices(input.asInstanceOf[UTF8String], nGram, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.plans.GraftHash.minhashSlices($c, $nGram, $k);
         |${ev.isNull} = ${ev.value} == null;
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinhashSlices =
    copy(child = newChild)
}

/** `simhash_fp(text, bits)` → SimHash fingerprint long (see
  * [[GraftHash.simhashFp]]). */
case class SimhashFp(child: Expression, bits: Int)
    extends UnaryExpression {
  require(bits >= 1 && bits <= 64,
    s"bits=$bits out of range: md5's 32 hex digits give two bit planes = 64 bits")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${other.sql}")
    }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "simhash_fp"

  override protected def nullSafeEval(input: Any): Any =
    GraftHash.simhashFp(input.asInstanceOf[UTF8String], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.GraftHash.simhashFp($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SimhashFp =
    copy(child = newChild)
}

/** `winnow_fingerprints(text, nGram, w)` → ascending array of the distinct
  * winnowing fingerprints (see [[GraftHash.winnowFingerprints]]). */
case class WinnowFingerprints(child: Expression, nGram: Int, w: Int)
    extends UnaryExpression {
  require(nGram >= 1 && w >= 1,
    s"winnow_fingerprints needs positive nGram/w, got ($nGram, $w)")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${other.sql}")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true // short input → null
  override def prettyName: String = "winnow_fingerprints"

  override protected def nullSafeEval(input: Any): Any =
    GraftHash.winnowFingerprints(input.asInstanceOf[UTF8String], nGram, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.plans.GraftHash.winnowFingerprints($c, $nGram, $w);
         |${ev.isNull} = ${ev.value} == null;
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

/** `winnow_cut_spans(text, fps, nGram)` → ascending non-overlapping
  * (s, e) char intervals covering every kgram occurrence whose hash is
  * in `fps` (see [[GraftHash.winnowCutSpans]] — the passage-excision
  * marker). Built directly via the Column bridge (nGram is a
  * construction parameter, the [[WinnowFingerprints]] convention). */
case class WinnowCutSpans(left: Expression, right: Expression, nGram: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  require(nGram >= 1, s"winnow_cut_spans needs positive nGram, got $nGram")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, array<string>), got $other")
    }
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("s",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("e",
        org.apache.spark.sql.types.IntegerType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "winnow_cut_spans"

  override protected def nullSafeEval(t: Any, fps: Any): Any =
    GraftHash.winnowCutSpans(t.asInstanceOf[UTF8String],
      fps.asInstanceOf[ArrayData], nGram)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, f) => {
      s"""
         |${ev.value} = graft.plans.GraftHash.winnowCutSpans($t, $f, $nGram);
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WinnowCutSpans =
    copy(left = newLeft, right = newRight)
}

/** `fingerprint_min(text, nGram)` → lexicographic minimum md5 hex over the
  * char n-gram shingles (see [[GraftHash.fingerprintMin]]). */
case class FingerprintMin(child: Expression, nGram: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${other.sql}")
    }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "fingerprint_min"

  override protected def nullSafeEval(input: Any): Any =
    GraftHash.fingerprintMin(input.asInstanceOf[UTF8String], nGram)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.plans.GraftHash.fingerprintMin($c, $nGram);
         |${ev.isNull} = ${ev.value} == null;
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FingerprintMin =
    copy(child = newChild)
}

/** `gopher_rep_pass(text)` → the AND of the thirteen Gopher REPETITION
  * rules ([[GopherRepCore]] — one shared core with the detail-emitting
  * `TextOps.gopherRepOf`, so the fused gate and the operator cannot
  * drift). Row-level and codegen'd: composes into a curation manifest's
  * single gate scan like any boolean Column. */
case class GopherRepPass(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${other.sql}")
    }
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  // nullSafeEval/nullSafeCodeGen null-propagate, so the declared
  // nullability must track the child's — declaring false while a null
  // child yields null lets a projection read an undefined value
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "gopher_rep_pass"

  override protected def nullSafeEval(input: Any): Any =
    GopherRepCore.pass(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.plans.GopherRepCore.pass($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): GopherRepPass =
    copy(child = newChild)
}

/** `gopher_rep_flags(text)` → the full Gopher REPETITION verdict struct
  * (n_lines, tok_chars, the 13 rule booleans, rep_pass) — the
  * detail-emitting twin of [[GopherRepPass]], same [[GopherRepCore]],
  * so gate and detail cannot drift. NEVER null: a null text evaluates
  * to the gate's verdict shape (0 lines, all-false, rep_pass = false)
  * inside [[GopherRepCore.flagsRow]] — `TextOps.gopherRepOf` rides this
  * instead of an RDD hop, so the operator face stays inside Tungsten
  * AND null-safe (round 18; was an NPE through `text.split`). */
case class GopherRepFlags(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${other.sql}")
    }
  override def dataType: DataType = GopherRepFlags.schema
  override def nullable: Boolean = false
  override def prettyName: String = "gopher_rep_flags"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    GopherRepCore.flagsRow(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    ev.copy(
      code = c.code +
        code"""
          |InternalRow ${ev.value} = graft.plans.GopherRepCore.flagsRow(
          |  ${c.isNull} ? null : ${c.value});
          |""".stripMargin,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): GopherRepFlags =
    copy(child = newChild)
}

object GopherRepFlags {
  import org.apache.spark.sql.types.{BooleanType, LongType, StructField, StructType}
  /** Field order = [[GopherRepCore.flagsRow]]'s slot order. */
  val schema: StructType = StructType(
    Seq(StructField("n_lines", LongType), StructField("tok_chars", LongType)) ++
      GopherRepCore.FlagNames.map(StructField(_, BooleanType)) :+
      StructField("rep_pass", BooleanType))
}
