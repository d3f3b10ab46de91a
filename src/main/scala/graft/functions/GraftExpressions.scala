package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the two hot per-row kernels the
  * built-in surface can't run fast:
  *
  *  - [[DotProductD]] — the cosine/ANN inner loop. The higher-order
  *    `aggregate(zip_with(a, b, *), 0.0, +)` formulation is interpreted
  *    per element (~50s for 2M pairs × 64 dims at sf0.1); this compiles
  *    to a tight primitive `for` loop inside whole-stage codegen. The
  *    summation is the same left-to-right fold, so results stay
  *    bit-identical to the SQL-oracle formulation.
  *
  *  - [[WordShingles]] — distinct word n-grams in one pass over the
  *    string. The `transform(sequence(…), i -> concat_ws(element_at×n))`
  *    + `array_distinct` formulation interprets ~5 expression nodes per
  *    shingle; this is one JVM loop per document. Semantics match
  *    `split(text, ' ')` exactly (single-space delimiter, empty tokens
  *    preserved, first-occurrence distinct order).
  */
object GraftExpressions {

  /** Σ a[i]·b[i] over array<double> columns, left-to-right. Null arrays
    * propagate null; mismatched lengths yield null rather than a silently
    * truncated dot product (a ragged vector is corrupt input — the SQL
    * oracle formulation also nulls there, via out-of-range list indexing).
    * Elements are assumed non-null (vector data).
    */
  case class DotProductD(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (y.numElements() != n) null
      else {
        var s = 0.0
        var i = 0
        while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
        s
      }
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val sum = ctx.freshName("sum")
        s"""
           |int $n = $a.numElements();
           |if ($b.numElements() != $n) {
           |  ${ev.isNull} = true;
           |} else {
           |  double $sum = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    $sum += $a.getDouble($i) * $b.getDouble($i);
           |  }
           |  ${ev.value} = $sum;
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)

    override def prettyName: String = "graft_dot"
  }

  /** Σ a[i]·b[i] over array<bigint> columns — [[DotProductD]]'s exact
    * integer twin, the SQ8/quantized-scan inner loop (s19): the
    * higher-order `aggregate(zip_with(a, b, *), 0L, +)` formulation
    * interprets per element; this is a tight primitive loop inside
    * whole-stage codegen. Long addition is associative and exact, so the
    * result is bit-identical to any fold order and to the SQL oracle.
    * Same null contract as DotProductD (null arrays / ragged pair → null).
    */
  case class DotProductL(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (y.numElements() != n) null
      else {
        var s = 0L
        var i = 0
        while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
        s
      }
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val sum = ctx.freshName("sum")
        s"""
           |int $n = $a.numElements();
           |if ($b.numElements() != $n) {
           |  ${ev.isNull} = true;
           |} else {
           |  long $sum = 0L;
           |  for (int $i = 0; $i < $n; $i++) {
           |    $sum += $a.getLong($i) * $b.getLong($i);
           |  }
           |  ${ev.value} = $sum;
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)

    override def prettyName: String = "graft_dotl"
  }

  /** Distinct space-joined word n-grams of a text column. Tokenization is
    * a literal single-space split with empty tokens preserved — identical
    * to `split(text, ' ')` / DuckDB `string_split` — so oracle SQL can
    * reproduce the shingle set exactly. Texts shorter than n words yield
    * an empty array. Per-row work is one string pass (CodegenFallback is
    * fine: the kernel is a single JVM call per row, not per element).
    */
  case class WordShingles(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {
    require(n >= 1, "shingle size must be >= 1")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)

    override def nullSafeEval(input: Any): Any = {
      val words = input.toString.split(" ", -1)
      if (words.length < n) new GenericArrayData(Array.empty[Any])
      else {
        val seen = new java.util.LinkedHashSet[String]()
        var i = 0
        while (i <= words.length - n) {
          val sb = new java.lang.StringBuilder(words(i))
          var j = 1
          while (j < n) { sb.append(' ').append(words(i + j)); j += 1 }
          seen.add(sb.toString)
          i += 1
        }
        val arr = new Array[Any](seen.size)
        val it = seen.iterator()
        var k = 0
        while (it.hasNext) { arr(k) = UTF8String.fromString(it.next()); k += 1 }
        new GenericArrayData(arr)
      }
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)

    override def prettyName: String = "graft_shingles"
  }

  private val hexChars = "0123456789abcdef".toCharArray
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def md5Hex(s: UTF8String): String = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes)
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** MinHash signature of a shingle array in one JVM pass.
    *
    * Per shingle, one md5 yields two 28-bit values a,b (hex chars 1-7 and
    * 8-14 — identical to `conv(substring(md5(s),…),16,10)`), and the K
    * hash family is Carter-Wegman `h_i = (a + i·b) mod M` (M prime
    * < 2^28, so `a + 31·b` stays in exact long range). sig[i] = min over
    * shingles — bit-identical to the SQL-oracle formulation but ~30×
    * cheaper than the explode/zip_with plan (one md5 per shingle instead
    * of K, no shuffle, no interpreted lambdas).
    */
  case class MinHashSig(child: Expression, k: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val sig = Array.fill(k)(Long.MaxValue)
      var s = 0
      while (s < n) {
        val hex = md5Hex(arr.getUTF8String(s))
        val a = java.lang.Long.parseLong(hex.substring(0, 7), 16)
        val b = java.lang.Long.parseLong(hex.substring(7, 14), 16)
        var i = 0
        while (i < k) {
          val h = (a + i * b) % MinHashSig.M
          if (h < sig(i)) sig(i) = h
          i += 1
        }
        s += 1
      }
      new GenericArrayData(sig.map(x => x: Any))
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "graft_minhash"
  }

  object MinHashSig {
    /** prime < 2^28 keeping the CW fold in exact long arithmetic */
    val M = 268435399L
  }

  /** SimHash of a token array in one pass: per token, a 60-bit md5-prefix
    * hash (= `conv(substring(md5(t),1,15),16,10)`); bit b of the output is
    * the sign of Σ±1 over tokens. Matches the explode/group SQL oracle
    * bit-for-bit.
    */
  case class SimHashSig(child: Expression, bits: Int)
      extends UnaryExpression with CodegenFallback {
    require(bits > 0 && bits <= 60)
    override def dataType: DataType = LongType

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val acc = new Array[Int](bits)
      var t = 0
      while (t < n) {
        val h = java.lang.Long.parseLong(md5Hex(arr.getUTF8String(t)).substring(0, 15), 16)
        var b = 0
        while (b < bits) {
          if (((h >> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
        t += 1
      }
      var sim = 0L
      var b = 0
      while (b < bits) { if (acc(b) > 0) sim |= (1L << b); b += 1 }
      sim
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "graft_simhash"
  }

  /** Byte histogram statistics of a binary column in one pass:
    * (n, distinct, maxc, coll) where coll = Σ c·(c−1) over byte counts —
    * the ingredients of the modal-byte ratio and index of coincidence.
    * Value-identical to the hex/explode/group-by relational formulation
    * (`GraftExpressionsSpec` enforces it) but per-row with a 256-slot
    * array: no explode, no shuffle, no 2-chars-per-byte blowup.
    */
  case class ByteHistStats(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == BinaryType) {
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      } else {
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_bytehist requires BINARY input, got ${child.dataType.sql}")
      }
    override def dataType: DataType = StructType(Seq(
      StructField("n", LongType, nullable = false),
      StructField("distinct", LongType, nullable = false),
      StructField("maxc", LongType, nullable = false),
      StructField("coll", LongType, nullable = false)))

    override def nullSafeEval(input: Any): Any = {
      val bytes = input.asInstanceOf[Array[Byte]]
      val hist = new Array[Long](256)
      var i = 0
      while (i < bytes.length) { hist(bytes(i) & 0xff) += 1; i += 1 }
      var distinct = 0L
      var maxc = 0L
      var coll = 0L
      var b = 0
      while (b < 256) {
        val c = hist(b)
        if (c > 0) {
          distinct += 1
          if (c > maxc) maxc = c
          coll += c * (c - 1)
        }
        b += 1
      }
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](bytes.length.toLong, distinct, maxc, coll))
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "graft_bytehist"
  }

  /** Full 256-cell byte histogram as array<long> — the one-pass kernel
    * behind per-(doc, byte) count streams: `posexplode` of the result
    * yields ≤256 narrow rows per doc instead of one row per BYTE of
    * payload (the hex-split explode it replaces materialized the whole
    * corpus as 2-char strings before aggregating them back down).
    */
  case class ByteHistArr(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == BinaryType) {
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      } else {
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_bytehist_arr requires BINARY input, got ${child.dataType.sql}")
      }
    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def nullSafeEval(input: Any): Any = {
      val bytes = input.asInstanceOf[Array[Byte]]
      val hist = new Array[Long](256)
      var i = 0
      while (i < bytes.length) { hist(bytes(i) & 0xff) += 1; i += 1 }
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(hist)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "graft_bytehist_arr"
  }

  /** |array_intersect(a, b)| without materializing the intersection
    * array — the hot inner expression of every exact-Jaccard verify join
    * (d2/d3/d6 compute `size(array_intersect(sa, sb))` per candidate
    * pair, twice per row once for the filter and once for the output).
    * Semantics match `size(array_intersect)` exactly for string arrays:
    * count of DISTINCT elements of `a` that also occur in `b` (null
    * elements counted once if present in both, mirroring
    * ArrayIntersect's null handling). [[graft.GraftOptimizerRules]]
    * rewrites the built-in pattern to this expression automatically in
    * extension-enabled sessions.
    */
  case class IntersectCountS(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      def ok(dt: DataType) = dt match {
        case ArrayType(StringType, _) => true
        case _ => false
      }
      if (ok(left.dataType) && ok(right.dataType))
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_intersect_count requires two ARRAY<STRING> inputs, got " +
            s"${left.dataType.sql}, ${right.dataType.sql}")
    }
    override def dataType: DataType = IntegerType
    override def nullable: Boolean = left.nullable || right.nullable

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      // probe the SMALLER side into the hash set
      val (probe, build) =
        if (x.numElements() <= y.numElements()) (y, x) else (x, y)
      val set = new java.util.HashSet[Any](build.numElements() * 2)
      var i = 0
      val nb = build.numElements()
      while (i < nb) { set.add(build.get(i, StringType)); i += 1 }
      var count = 0
      var j = 0
      val np = probe.numElements()
      // removing on hit both de-duplicates and shrinks the probe target,
      // so each common element counts exactly once (array_intersect
      // returns DISTINCT elements)
      while (j < np) {
        if (set.remove(probe.get(j, StringType))) count += 1
        j += 1
      }
      count
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
    override def prettyName: String = "graft_intersect_count"
  }

  /** Argmin cell assignment over a broadcast codebook — the Lloyd/IVF
    * inner loop (s14/s16/s18/s20/s21/w23 assign stages). Inputs: a
    * vector `v: array<double>` and the one-row sorted codebook `cents:
    * array<struct<cell: bigint, cv: array<double>>>`; output:
    * `struct<dist: double, cell: bigint>` — the first strict minimum of
    * the per-cell left-to-right squared-L2 fold, i.e. exactly
    * (ORDER BY dist, cell LIMIT 1) since `cents` is cell-ascending.
    *
    * Bit-identical replacement for the higher-order formulation
    * `aggregate(transform(cents, c -> struct(aggregate(zip_with(v, cv,
    * (x,y) -> (x-y)²), 0.0, +), cell)), struct(∞, -1L), keep-strict-min)`
    * which interprets ~5 expression nodes per (cell × dim) per row; this
    * is one primitive nested loop inside whole-stage codegen. The
    * distance is the same left-to-right float fold; a ragged `cv`
    * (length ≠ len(v)) is skipped, matching the HOF chain where
    * zip_with's null padding nulls the fold and the null dist loses the
    * strict-< comparison; empty/all-ragged codebooks yield (∞, -1), the
    * HOF init.
    */
  case class ArgMinCell(left: Expression, right: Expression) extends BinaryExpression {
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      val ok = (left.dataType, right.dataType) match {
        case (ArrayType(DoubleType, _),
              ArrayType(StructType(Array(f0, f1)), _)) =>
          f0.dataType == LongType && (f1.dataType match {
            case ArrayType(DoubleType, _) => true
            case _ => false
          })
        case _ => false
      }
      if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_argmin_cell requires (ARRAY<DOUBLE>, ARRAY<STRUCT<cell BIGINT, " +
          s"cv ARRAY<DOUBLE>>>), got ${left.dataType.sql}, ${right.dataType.sql}")
    }
    override def dataType: DataType = StructType(Seq(
      StructField("dist", DoubleType, nullable = false),
      StructField("cell", LongType, nullable = false)))
    override def nullable: Boolean = true

    override def nullSafeEval(a: Any, b: Any): Any = {
      val v = a.asInstanceOf[ArrayData]
      val cents = b.asInstanceOf[ArrayData]
      val n = v.numElements()
      var bestD = Double.PositiveInfinity
      var bestC = -1L
      var j = 0
      val nc = cents.numElements()
      while (j < nc) {
        if (!cents.isNullAt(j)) {
          val st = cents.getStruct(j, 2)
          if (!st.isNullAt(1)) {
            val cv = st.getArray(1)
            if (cv.numElements() == n) {
              var s = 0.0
              var i = 0
              while (i < n) {
                val d = v.getDouble(i) - cv.getDouble(i)
                s += d * d
                i += 1
              }
              if (s < bestD) { bestD = s; bestC = st.getLong(0) }
            }
          }
        }
        j += 1
      }
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](bestD, bestC))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val n = ctx.freshName("n")
        val nc = ctx.freshName("nc")
        val st = ctx.freshName("st")
        val cv = ctx.freshName("cv")
        val s = ctx.freshName("s")
        val d = ctx.freshName("d")
        val bestD = ctx.freshName("bestD")
        val bestC = ctx.freshName("bestC")
        s"""
           |int $n = $a.numElements();
           |int $nc = $b.numElements();
           |double $bestD = Double.POSITIVE_INFINITY;
           |long $bestC = -1L;
           |for (int $j = 0; $j < $nc; $j++) {
           |  if ($b.isNullAt($j)) continue;
           |  InternalRow $st = $b.getStruct($j, 2);
           |  if ($st.isNullAt(1)) continue;
           |  ArrayData $cv = $st.getArray(1);
           |  if ($cv.numElements() != $n) continue;
           |  double $s = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    double $d = $a.getDouble($i) - $cv.getDouble($i);
           |    $s += $d * $d;
           |  }
           |  if ($s < $bestD) { $bestD = $s; $bestC = $st.getLong(0); }
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
           |  new Object[]{$bestD, $bestC});
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)

    override def prettyName: String = "graft_argmin_cell"
  }

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(k: Int, IntegerType) => k
    case other => throw new IllegalArgumentException(s"$what must be an int literal, got $other")
  }

  /** THE one builder list — (name, usage, builder) — behind both
    * registration routes: [[register]] (imperative, per session) and
    * [[graft.GraftExtensions]] (config-injected). A kernel added here is
    * available through both automatically; they cannot drift.
    */
  val builders: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("graft_dot", "graft_dot(a, b) - left-to-right dot product of two double arrays",
      exprs => DotProductD(exprs(0), exprs(1))),
    ("graft_dotl", "graft_dotl(a, b) - exact integer dot product of two bigint arrays",
      exprs => DotProductL(exprs(0), exprs(1))),
    ("graft_shingles", "graft_shingles(text, n) - distinct word n-gram shingles",
      exprs => WordShingles(exprs(0), intLit(exprs(1), "graft_shingles size"))),
    ("graft_minhash", "graft_minhash(shingles, k) - Carter-Wegman MinHash signature",
      exprs => MinHashSig(exprs(0), intLit(exprs(1), "graft_minhash k"))),
    ("graft_simhash", "graft_simhash(tokens, bits) - sign-of-sums SimHash",
      exprs => SimHashSig(exprs(0), intLit(exprs(1), "graft_simhash bits"))),
    ("graft_bytehist", "graft_bytehist(bin) - byte histogram stats (n, distinct, maxc, coll)",
      exprs => ByteHistStats(exprs(0))),
    ("graft_bytehist_arr", "graft_bytehist_arr(bin) - full 256-cell byte histogram as array<long>",
      exprs => ByteHistArr(exprs(0))),
    ("graft_intersect_count", "graft_intersect_count(a, b) - |array_intersect(a, b)| without materializing it",
      exprs => IntersectCountS(exprs(0), exprs(1))),
    ("graft_argmin_cell", "graft_argmin_cell(v, cents) - (dist, cell) argmin over a sorted codebook array",
      exprs => ArgMinCell(exprs(0), exprs(1))),
    ("graft_topk", "graft_topk(score, id, k) - exact top-k (score DESC, id ASC) pairs per group (aggregate)",
      exprs => TopKPairs(exprs(0), exprs(1), intLit(exprs(2), "graft_topk k"))))

  /** Register the expressions in the session's function registry (the
    * public route to custom expressions: `call_function` after
    * registration). Idempotent AND quiet: re-registering an existing temp
    * function logs a WARN per call (which pollutes the benchmark's
    * stdout), so each function is checked individually — a session that
    * predates a newly added kernel still picks it up.
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, _, builder) =>
      if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
        reg.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
  }

  /** Σ a[i]·b[i] as a Column (arrays of double). */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** Exact integer dot product of two array<bigint> columns. */
  def dotl(a: Column, b: Column): Column = call_function("graft_dotl", a, b)

  /** Exact top-k (score DESC, id ASC) pairs — an aggregate Column. */
  def topk(score: Column, id: Column, k: Int): Column =
    call_function("graft_topk", score, id, lit(k))

  /** Distinct word n-gram shingles as a Column. */
  def shingles(text: Column, n: Int): Column =
    call_function("graft_shingles", text, lit(n))

  /** K-element MinHash signature of a shingle array. */
  def minhash(shingles: Column, k: Int): Column =
    call_function("graft_minhash", shingles, lit(k))

  /** SimHash (sign-of-sums) of a token array. */
  def simhash(tokens: Column, bits: Int): Column =
    call_function("graft_simhash", tokens, lit(bits))

  /** One-pass byte-histogram stats struct (n, distinct, maxc, coll). */
  def byteHist(bin: Column): Column = call_function("graft_bytehist", bin)

  def byteHistArr(bin: Column): Column = call_function("graft_bytehist_arr", bin)

  /** |array_intersect(a, b)| for string arrays, no intermediate array. */
  def intersectCount(a: Column, b: Column): Column =
    call_function("graft_intersect_count", a, b)

  /** (dist, cell) argmin of `v` over a sorted codebook column. */
  def argminCell(v: Column, cents: Column): Column =
    call_function("graft_argmin_cell", v, cents)
}
