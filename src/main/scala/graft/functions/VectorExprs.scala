package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the hot vector/text paths.
  *
  * The builtin higher-order functions (`aggregate`/`zip_with`/`transform`)
  * are CodegenFallback — every array element costs an interpreted
  * expression-tree walk. For the similarity/dedup inner loops (millions of
  * candidate pairs × 64 elements) that interpretation dominates the run
  * time, which is exactly the case the Spark docs reserve for native
  * `Expression`s with `doGenCode` (preference order: builtins → custom
  * Expression → custom operator → mapPartitions).
  *
  * Semantics parity: [[FloatVecDot]] accumulates left-to-right in double
  * after per-element float→double widening — bit-identical to the
  * `aggregate(zip_with(...))` formulation it replaces (and to the DuckDB
  * oracle's `list_cosine_similarity` over double-cast lists).
  */
object VectorExprs {

  /** Dot product of two float-array columns, accumulated in double. */
  case class FloatVecDot(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (y.numElements() != n)
        throw new IllegalArgumentException(
          s"float_dot: dimension mismatch ($n vs ${y.numElements()})")
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
        i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        s"""
           |int $n = $a.numElements();
           |if ($b.numElements() != $n) {
           |  throw new IllegalArgumentException(
           |    "float_dot: dimension mismatch (" + $n + " vs " + $b.numElements() + ")");
           |}
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** SimHash-64 of a token array: per-bit majority vote over xxhash64
    * token hashes (seed 42, matching the SQL `xxhash64` builtin so
    * signatures are comparable with plan-level variants). One tight JVM
    * loop per row instead of 64 interpreted folds.
    */
  case class SimHash64(child: Expression)
      extends UnaryExpression {

    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true

    override protected def nullSafeEval(input: Any): Any = {
      val toks = input.asInstanceOf[ArrayData]
      val votes = new Array[Int](64)
      val n = toks.numElements()
      var i = 0
      while (i < n) {
        val t = toks.getUTF8String(i)
        val h = XxHash64Function.hash(t, StringType, 42L)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
        i += 1
      }
      var fp = 0L
      var j = 0
      while (j < 64) {
        if (votes(j) > 0) fp |= (1L << j)
        j += 1
      }
      fp
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, toks => {
        val votes = ctx.freshName("votes")
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val h = ctx.freshName("h")
        val fp = ctx.freshName("fp")
        // the singleton's static field lives on the `XxHash64Function$`
        // class — `$` is a legal Java identifier char, so name it directly
        val xxhash = "org.apache.spark.sql.catalyst.expressions.XxHash64Function$.MODULE$"
        s"""
           |int[] $votes = new int[64];
           |int $n = $toks.numElements();
           |for (int $i = 0; $i < $n; $i++) {
           |  long $h = $xxhash.hash($toks.getUTF8String($i),
           |    org.apache.spark.sql.types.DataTypes.StringType, 42L);
           |  for (int $j = 0; $j < 64; $j++) {
           |    if ((($h >>> $j) & 1L) == 1L) $votes[$j]++; else $votes[$j]--;
           |  }
           |}
           |long $fp = 0L;
           |for (int $j = 0; $j < 64; $j++) {
           |  if ($votes[$j] > 0) $fp |= (1L << $j);
           |}
           |${ev.value} = $fp;
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** MinHash signature as a native expression: for each of `numHashes`
    * permutations `(a_i * h(s) + b_i) mod p`, the min over the shingle
    * array (h = xxhash64 folded into [0, p)). Returns array<long>.
    * Coefficients are injected (deterministic, fixed-seed — see
    * [[graft.dedup.Dedup.permutations]]).
    */
  case class MinHashSignature(child: Expression, as: Seq[Long], bs: Seq[Long], prime: Long)
      extends UnaryExpression {

    require(as.length == bs.length)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true

    override protected def nullSafeEval(input: Any): Any = {
      val shingles = input.asInstanceOf[ArrayData]
      val k = as.length
      val sig = Array.fill(k)(Long.MaxValue)
      val n = shingles.numElements()
      var i = 0
      while (i < n) {
        val s = shingles.getUTF8String(i)
        val raw = XxHash64Function.hash(s, StringType, 42L)
        val x = ((raw % prime) + prime) % prime
        var j = 0
        while (j < k) {
          val v = (as(j) * x + bs(j)) % prime
          if (v < sig(j)) sig(j) = v
          j += 1
        }
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(sig)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val aArr = ctx.addReferenceObj("as", as.toArray, "long[]")
      val bArr = ctx.addReferenceObj("bs", bs.toArray, "long[]")
      nullSafeCodeGen(ctx, ev, shingles => {
        val k = as.length
        val sig = ctx.freshName("sig")
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val x = ctx.freshName("x")
        val v = ctx.freshName("v")
        val xxhash = "org.apache.spark.sql.catalyst.expressions.XxHash64Function$.MODULE$"
        s"""
           |long[] $sig = new long[$k];
           |java.util.Arrays.fill($sig, Long.MAX_VALUE);
           |int $n = $shingles.numElements();
           |for (int $i = 0; $i < $n; $i++) {
           |  long $x = $xxhash.hash($shingles.getUTF8String($i),
           |    org.apache.spark.sql.types.DataTypes.StringType, 42L);
           |  $x = (($x % ${prime}L) + ${prime}L) % ${prime}L;
           |  for (int $j = 0; $j < $k; $j++) {
           |    long $v = ($aArr[$j] * $x + $bArr[$j]) % ${prime}L;
           |    if ($v < $sig[$j]) $sig[$j] = $v;
           |  }
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Signed-random-projection signature: bit p = sign(v · plane_p), the
    * whole signature in one codegen'd loop. `planes` is row-major
    * (numPlanes × dim), injected as a constant.
    */
  case class SrpSignature(child: Expression, planes: Array[Double], numPlanes: Int)
      extends UnaryExpression {

    require(numPlanes > 0 && numPlanes <= 63 && planes.length % numPlanes == 0)
    private val dim = planes.length / numPlanes

    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true

    override protected def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      if (v.numElements() != dim)
        throw new IllegalArgumentException(
          s"srp_signature: vector dim ${v.numElements()} != plane dim $dim")
      val n = dim
      var sig = 0L
      var p = 0
      while (p < numPlanes) {
        var acc = 0.0
        var i = 0
        val off = p * dim
        while (i < n) {
          acc += v.getFloat(i).toDouble * planes(off + i)
          i += 1
        }
        if (acc > 0) sig |= (1L << p)
        p += 1
      }
      sig
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val pl = ctx.addReferenceObj("planes", planes, "double[]")
      nullSafeCodeGen(ctx, ev, v => {
        val sig = ctx.freshName("sig")
        val acc = ctx.freshName("acc")
        val n = ctx.freshName("n")
        val p = ctx.freshName("p")
        val i = ctx.freshName("i")
        val off = ctx.freshName("off")
        s"""
           |long $sig = 0L;
           |if ($v.numElements() != $dim) {
           |  throw new IllegalArgumentException(
           |    "srp_signature: vector dim " + $v.numElements() + " != plane dim " + $dim);
           |}
           |int $n = $dim;
           |for (int $p = 0; $p < $numPlanes; $p++) {
           |  double $acc = 0.0;
           |  int $off = $p * $dim;
           |  for (int $i = 0; $i < $n; $i++) {
           |    $acc += (double) $v.getFloat($i) * $pl[$off + $i];
           |  }
           |  if ($acc > 0) $sig |= (1L << $p);
           |}
           |${ev.value} = $sig;
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** All SRP band keys in ONE expression: key j = `bitsPerBand`-bit
    * signature over the row-major plane slice [j·bits, (j+1)·bits).
    * Semantically identical to `bands` separate [[SrpSignature]]s over
    * slices, but a single codegen loop — with 64+ bands the per-band
    * expression form makes whole-stage codegen emit tens of KB of Java
    * whose janino compile dominates small-corpus runs (~10 s fixed).
    */
  case class SrpBandKeys(child: Expression, planes: Array[Double],
                         bands: Int, bitsPerBand: Int)
      extends UnaryExpression {

    require(bands > 0 && bitsPerBand > 0 && bitsPerBand <= 63 &&
      planes.length % (bands * bitsPerBand) == 0)
    private val dim = planes.length / (bands * bitsPerBand)
    private val totalPlanes = bands * bitsPerBand

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true

    override protected def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      if (v.numElements() != dim)
        throw new IllegalArgumentException(
          s"srp_band_keys: vector dim ${v.numElements()} != plane dim $dim")
      val n = dim
      val keys = new Array[Long](bands)
      var p = 0
      while (p < totalPlanes) {
        var acc = 0.0
        var i = 0
        val off = p * dim
        while (i < n) {
          acc += v.getFloat(i).toDouble * planes(off + i)
          i += 1
        }
        if (acc > 0) keys(p / bitsPerBand) |= (1L << (p % bitsPerBand))
        p += 1
      }
      ArrayData.toArrayData(keys)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val pl = ctx.addReferenceObj("planes", planes, "double[]")
      nullSafeCodeGen(ctx, ev, v => {
        val keys = ctx.freshName("keys")
        val acc = ctx.freshName("acc")
        val n = ctx.freshName("n")
        val p = ctx.freshName("p")
        val i = ctx.freshName("i")
        val off = ctx.freshName("off")
        s"""
           |long[] $keys = new long[$bands];
           |if ($v.numElements() != $dim) {
           |  throw new IllegalArgumentException(
           |    "srp_band_keys: vector dim " + $v.numElements() + " != plane dim " + $dim);
           |}
           |int $n = $dim;
           |for (int $p = 0; $p < $totalPlanes; $p++) {
           |  double $acc = 0.0;
           |  int $off = $p * $dim;
           |  for (int $i = 0; $i < $n; $i++) {
           |    $acc += (double) $v.getFloat($i) * $pl[$off + $i];
           |  }
           |  if ($acc > 0) $keys[$p / $bitsPerBand] |= (1L << ($p % $bitsPerBand));
           |}
           |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($keys);
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Top-`n` nearest centroids of a float-vector column — the IVF
    * coarse-quantizer assignment in ONE expression. The centroid matrix
    * (row-major `float[numCells*dim]`) and per-centroid norms ride along
    * as codegen reference objects, so `numCells` is a runtime loop bound
    * rather than an expression-tree width: one struct-expression per
    * cell (the naive spelling) makes janino whole-stage compile time the
    * dominant cost past ~64 cells — same lesson as [[SrpBandKeys]].
    *
    * Ranking key is (dot/centroidNorm) ≡ cosine up to the row's own
    * positive norm; ties broken toward the HIGHER cell index, matching
    * `array_max` / descending `array_sort` over `struct(sim, cell)` so
    * swapping the naive spelling for this one cannot reorder any result.
    * Accumulation is ascending-index double — bit-identical to
    * [[FloatVecDot]] against a centroid literal.
    */
  case class NearestCells(child: Expression, cents: Array[Float],
                          centNorms: Array[Double], n: Int)
      extends UnaryExpression {

    require(n > 0 && centNorms.length > 0 &&
      cents.length % centNorms.length == 0)
    private val numCells = centNorms.length
    private val dim = cents.length / numCells

    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullIntolerant: Boolean = true

    override protected def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      if (v.numElements() != dim)
        throw new IllegalArgumentException(
          s"nearest_cells: vector dim ${v.numElements()} != centroid dim $dim")
      val keep = math.min(n, numCells)
      val simBuf = new Array[Double](keep)
      val cellBuf = new Array[Int](keep)
      var m = 0
      var c = 0
      while (c < numCells) {
        var acc = 0.0
        val off = c * dim
        var i = 0
        while (i < dim) {
          acc += v.getFloat(i).toDouble * cents(off + i).toDouble
          i += 1
        }
        val sim = acc / centNorms(c)
        if (m < keep || sim > simBuf(m - 1) ||
            (sim == simBuf(m - 1) && c > cellBuf(m - 1))) {
          var j = if (m < keep) m else keep - 1
          while (j > 0 && (sim > simBuf(j - 1) ||
              (sim == simBuf(j - 1) && c > cellBuf(j - 1)))) {
            simBuf(j) = simBuf(j - 1); cellBuf(j) = cellBuf(j - 1); j -= 1
          }
          simBuf(j) = sim; cellBuf(j) = c
          if (m < keep) m += 1
        }
        c += 1
      }
      ArrayData.toArrayData(java.util.Arrays.copyOf(cellBuf, m))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ce = ctx.addReferenceObj("cents", cents, "float[]")
      val no = ctx.addReferenceObj("centNorms", centNorms, "double[]")
      nullSafeCodeGen(ctx, ev, v => {
        val simBuf = ctx.freshName("simBuf")
        val cellBuf = ctx.freshName("cellBuf")
        val m = ctx.freshName("m")
        val c = ctx.freshName("c")
        val acc = ctx.freshName("acc")
        val off = ctx.freshName("off")
        val i = ctx.freshName("i")
        val sim = ctx.freshName("sim")
        val j = ctx.freshName("j")
        val keep = ctx.freshName("keep")
        s"""
           |if ($v.numElements() != $dim) {
           |  throw new IllegalArgumentException(
           |    "nearest_cells: vector dim " + $v.numElements() + " != centroid dim " + $dim);
           |}
           |int $keep = ${math.min(n, numCells)};
           |double[] $simBuf = new double[$keep];
           |int[] $cellBuf = new int[$keep];
           |int $m = 0;
           |for (int $c = 0; $c < $numCells; $c++) {
           |  double $acc = 0.0;
           |  int $off = $c * $dim;
           |  for (int $i = 0; $i < $dim; $i++) {
           |    $acc += (double) $v.getFloat($i) * (double) $ce[$off + $i];
           |  }
           |  double $sim = $acc / $no[$c];
           |  if ($m < $keep || $sim > $simBuf[$m - 1] ||
           |      ($sim == $simBuf[$m - 1] && $c > $cellBuf[$m - 1])) {
           |    int $j = ($m < $keep) ? $m : $keep - 1;
           |    while ($j > 0 && ($sim > $simBuf[$j - 1] ||
           |        ($sim == $simBuf[$j - 1] && $c > $cellBuf[$j - 1]))) {
           |      $simBuf[$j] = $simBuf[$j - 1]; $cellBuf[$j] = $cellBuf[$j - 1]; $j--;
           |    }
           |    $simBuf[$j] = $sim; $cellBuf[$j] = $c;
           |    if ($m < $keep) $m++;
           |  }
           |}
           |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
           |  java.util.Arrays.copyOf($cellBuf, $m));
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** All m product-quantization subspace codes of a vector in ONE loop
    * expression (see [[graft.similarity.Similarity.pqEncode]]).
    *
    * The unrolled spelling — per subspace, `array_max(array(struct(
    * float_dot(slice(vec,…), lit(cw)) − ½‖cw‖², code) × k))` — emits
    * O(m·k) dot blocks into the single codegen method of the Generate
    * stage that consumes it; at m=8, k=16 that crosses janino's 64 KB
    * method limit and Spark silently demotes the WHOLE encode stage to
    * interpreted execution (the logged
    * `InternalCompilerException: Code grows beyond 64 KB` fallback).
    * Identical math as a model-referencing loop stays ~40 generated
    * lines at any m·k.
    *
    * Bit-parity with the unrolled spelling: scores accumulate
    * ascending-index in double exactly like [[FloatVecDot]] against a
    * codeword literal (slicing is just a base offset); the ½‖cw‖² term
    * is precomputed driver-side with the same ascending-index sum; and
    * ties resolve to the HIGHER code exactly like `array_max` over
    * `struct(s, code)` under Spark's double ordering (`==`-equal first,
    * so ±0.0 tie, then `Double.compare`, NaN greatest).
    *
    * Model layout: codewords row-major in `cbFlat`; `offsets` (length
    * m+1) gives subspace j's global codeword range — ragged k per
    * subspace is fine (Lloyd drops empty codes); emitted codes are
    * LOCAL to the subspace (`global − offsets(j)`), preserving the old
    * per-subspace numbering.
    */
  case class PqCodes(child: Expression, cbFlat: Array[Float],
                     halves: Array[Double], offsets: Array[Int], subDim: Int)
      extends UnaryExpression {

    require(offsets.length >= 2 && subDim > 0 &&
      cbFlat.length == offsets.last * subDim &&
      halves.length == offsets.last)
    private val m = offsets.length - 1
    private val dim = m * subDim

    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullIntolerant: Boolean = true

    override protected def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      if (v.numElements() != dim)
        throw new IllegalArgumentException(
          s"pq_codes: vector dim ${v.numElements()} != m*subDim $dim")
      val out = new Array[Int](m)
      var j = 0
      while (j < m) {
        val base = j * subDim
        var best = Double.NegativeInfinity
        var bestC = -1
        var c = offsets(j)
        while (c < offsets(j + 1)) {
          var acc = 0.0
          val off = c * subDim
          var i = 0
          while (i < subDim) {
            acc += v.getFloat(base + i).toDouble * cbFlat(off + i).toDouble
            i += 1
          }
          val s = acc - halves(c)
          val cmp = if (s == best) 0 else java.lang.Double.compare(s, best)
          if (bestC < 0 || cmp >= 0) { best = s; bestC = c }
          c += 1
        }
        out(j) = bestC - offsets(j)
        j += 1
      }
      ArrayData.toArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cb = ctx.addReferenceObj("cbFlat", cbFlat, "float[]")
      val hv = ctx.addReferenceObj("halves", halves, "double[]")
      val ofs = ctx.addReferenceObj("offsets", offsets, "int[]")
      nullSafeCodeGen(ctx, ev, v => {
        val out = ctx.freshName("out")
        val j = ctx.freshName("j")
        val base = ctx.freshName("base")
        val best = ctx.freshName("best")
        val bestC = ctx.freshName("bestC")
        val c = ctx.freshName("c")
        val acc = ctx.freshName("acc")
        val off = ctx.freshName("off")
        val i = ctx.freshName("i")
        val s = ctx.freshName("s")
        val cmp = ctx.freshName("cmp")
        s"""
           |if ($v.numElements() != $dim) {
           |  throw new IllegalArgumentException(
           |    "pq_codes: vector dim " + $v.numElements() + " != m*subDim " + $dim);
           |}
           |int[] $out = new int[$m];
           |for (int $j = 0; $j < $m; $j++) {
           |  int $base = $j * $subDim;
           |  double $best = Double.NEGATIVE_INFINITY;
           |  int $bestC = -1;
           |  for (int $c = $ofs[$j]; $c < $ofs[$j + 1]; $c++) {
           |    double $acc = 0.0;
           |    int $off = $c * $subDim;
           |    for (int $i = 0; $i < $subDim; $i++) {
           |      $acc += (double) $v.getFloat($base + $i) * (double) $cb[$off + $i];
           |    }
           |    double $s = $acc - $hv[$c];
           |    int $cmp = ($s == $best) ? 0 : java.lang.Double.compare($s, $best);
           |    if ($bestC < 0 || $cmp >= 0) { $best = $s; $bestC = $c; }
           |  }
           |  $out[$j] = $bestC - $ofs[$j];
           |}
           |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Nearest codeword of ONE already-sliced subvector for subspace `j`
    * — the training-loop sibling of [[PqCodes]], for the exploded
    * `(id, subspace, subvector)` frame [[graft.similarity.Similarity.pqTrain]]
    * drives its Lloyd rounds over (the m-way `when` chain of unrolled
    * per-codeword scorers it replaces hits the same 64 KB fallback).
    * Same model layout and identical score/tie semantics as
    * [[PqCodes]].
    */
  case class PqNearestCode(sub: Expression, jExpr: Expression,
                           cbFlat: Array[Float], halves: Array[Double],
                           offsets: Array[Int], subDim: Int)
      extends BinaryExpression {

    require(offsets.length >= 2 && subDim > 0 &&
      cbFlat.length == offsets.last * subDim &&
      halves.length == offsets.last)
    private val m = offsets.length - 1

    override def left: Expression = sub
    override def right: Expression = jExpr
    override def dataType: DataType = IntegerType
    override def nullIntolerant: Boolean = true

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val v = a.asInstanceOf[ArrayData]
      val j = b.asInstanceOf[Int]
      if (j < 0 || j >= m)
        throw new IllegalArgumentException(s"pq_nearest_code: subspace $j not in [0, $m)")
      if (v.numElements() != subDim)
        throw new IllegalArgumentException(
          s"pq_nearest_code: subvector dim ${v.numElements()} != $subDim")
      var best = Double.NegativeInfinity
      var bestC = -1
      var c = offsets(j)
      while (c < offsets(j + 1)) {
        var acc = 0.0
        val off = c * subDim
        var i = 0
        while (i < subDim) {
          acc += v.getFloat(i).toDouble * cbFlat(off + i).toDouble
          i += 1
        }
        val s = acc - halves(c)
        val cmp = if (s == best) 0 else java.lang.Double.compare(s, best)
        if (bestC < 0 || cmp >= 0) { best = s; bestC = c }
        c += 1
      }
      bestC - offsets(j)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cb = ctx.addReferenceObj("cbFlat", cbFlat, "float[]")
      val hv = ctx.addReferenceObj("halves", halves, "double[]")
      val ofs = ctx.addReferenceObj("offsets", offsets, "int[]")
      nullSafeCodeGen(ctx, ev, (v, j) => {
        val best = ctx.freshName("best")
        val bestC = ctx.freshName("bestC")
        val c = ctx.freshName("c")
        val acc = ctx.freshName("acc")
        val off = ctx.freshName("off")
        val i = ctx.freshName("i")
        val s = ctx.freshName("s")
        val cmp = ctx.freshName("cmp")
        s"""
           |if ($j < 0 || $j >= $m) {
           |  throw new IllegalArgumentException(
           |    "pq_nearest_code: subspace " + $j + " not in [0, " + $m + ")");
           |}
           |if ($v.numElements() != $subDim) {
           |  throw new IllegalArgumentException(
           |    "pq_nearest_code: subvector dim " + $v.numElements() + " != " + $subDim);
           |}
           |double $best = Double.NEGATIVE_INFINITY;
           |int $bestC = -1;
           |for (int $c = $ofs[$j]; $c < $ofs[$j + 1]; $c++) {
           |  double $acc = 0.0;
           |  int $off = $c * $subDim;
           |  for (int $i = 0; $i < $subDim; $i++) {
           |    $acc += (double) $v.getFloat($i) * (double) $cb[$off + $i];
           |  }
           |  double $s = $acc - $hv[$c];
           |  int $cmp = ($s == $best) ? 0 : java.lang.Double.compare($s, $best);
           |  if ($bestC < 0 || $cmp >= 0) { $best = $s; $bestC = $c; }
           |}
           |${ev.value} = $bestC - $ofs[$j];
         """.stripMargin
      })
    }

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(sub = l, jExpr = r)
  }

  /** Space-joined token n-grams (optionally first-occurrence-distinct,
    * matching `array_distinct`) in ONE expression. Replaces the
    * `transform(sequence(...), i => concat_ws(" ", slice(...)))` HOF
    * spelling, which is CodegenFallback — every gram pays an
    * interpreted expression-tree walk, and the corpus-side shingle pass
    * is the single hottest text operation in MinHash dedup at 100 TB.
    * Callers pre-filter `size(toks) >= n` (empty result otherwise —
    * unlike `sequence`, which would count DOWN).
    */
  case class TokenNGrams(child: Expression, n: Int, distinct: Boolean)
      extends UnaryExpression {

    require(n > 0)

    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullIntolerant: Boolean = true

    override protected def nullSafeEval(input: Any): Any = {
      val toks = input.asInstanceOf[ArrayData]
      val count = toks.numElements() - n + 1
      if (count <= 0) return new GenericArrayData(new Array[Any](0))
      val sep = UTF8String.fromString(" ")
      val parts = new Array[UTF8String](n)
      if (distinct) {
        val seen = new java.util.LinkedHashSet[UTF8String]()
        var i = 0
        while (i < count) {
          var j = 0
          while (j < n) { parts(j) = toks.getUTF8String(i + j); j += 1 }
          seen.add(UTF8String.concatWs(sep, parts: _*))
          i += 1
        }
        new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
      } else {
        val out = new Array[Any](count)
        var i = 0
        while (i < count) {
          var j = 0
          while (j < n) { parts(j) = toks.getUTF8String(i + j); j += 1 }
          out(i) = UTF8String.concatWs(sep, parts: _*)
          i += 1
        }
        new GenericArrayData(out)
      }
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, toks => {
        val count = ctx.freshName("count")
        val sep = ctx.freshName("sep")
        val parts = ctx.freshName("parts")
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val out = ctx.freshName("out")
        val seen = ctx.freshName("seen")
        val u8 = "org.apache.spark.unsafe.types.UTF8String"
        val gad = "org.apache.spark.sql.catalyst.util.GenericArrayData"
        val fill =
          s"""for (int $j = 0; $j < $n; $j++) {
             |  $parts[$j] = $toks.getUTF8String($i + $j);
             |}""".stripMargin
        val body = if (distinct)
          s"""java.util.LinkedHashSet<$u8> $seen = new java.util.LinkedHashSet<$u8>();
             |for (int $i = 0; $i < $count; $i++) {
             |  $fill
             |  $seen.add($u8.concatWs($sep, $parts));
             |}
             |${ev.value} = new $gad($seen.toArray());""".stripMargin
        else
          s"""Object[] $out = new Object[java.lang.Math.max($count, 0)];
             |for (int $i = 0; $i < $count; $i++) {
             |  $fill
             |  $out[$i] = $u8.concatWs($sep, $parts);
             |}
             |${ev.value} = new $gad($out);""".stripMargin
        s"""
           |int $count = $toks.numElements() - $n + 1;
           |$u8 $sep = $u8.fromString(" ");
           |$u8[] $parts = new $u8[$n];
           |if ($count <= 0) {
           |  ${ev.value} = new $gad(new Object[0]);
           |} else {
           |  $body
           |}
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Shannon character entropy of a string in integer MICRO-BITS:
    * Σ over distinct code points c of round(−p·log2(p)·10⁶), with
    * p = count(c) / numChars and round = HALF_UP on the double term —
    * term-for-term the value the explode(sequence)+substr → (doc, char)
    * hash-agg plan computes ([[graft.text.TextAnalysis.charEntropy]]'s
    * pre-r15 shape, still the DuckDB oracle's formulation), so the two
    * spellings stay hash-comparable. The per-term BigDecimal HALF_UP
    * matches Spark's `round(double, 0)` exactly (same API), and the
    * integer micro-bit sum is order-invariant, so one in-place pass is
    * bit-identical to the decimal-sum aggregation.
    *
    * Scale rationale: the exploded plan shuffles one row per CORPUS
    * CHARACTER into the (doc, char) aggregate — ~7.5e8 rows at the
    * 500k-doc sf10 corpus, measured 414 s (20× on 10× data: the char
    * rows outgrew the map-side hash agg and spilled). This expression
    * folds the histogram per document inside the scan — map-only, no
    * shuffle at any corpus size, whole-stage-codegen via one static
    * call.
    */
  case class CharEntropyMicrobits(child: Expression)
      extends UnaryExpression {

    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true

    override protected def nullSafeEval(input: Any): Any =
      VectorExprs.charEntropyMicrobitsImpl(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, s =>
        s"${ev.value} = graft.functions.VectorExprs$$.MODULE$$" +
          s".charEntropyMicrobitsImpl($s);")

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** JVM body of [[CharEntropyMicrobits]] — shared by eval and codegen
    * (the generated code calls this static-equivalent method, so there
    * is exactly one arithmetic spelling). Code points, not UTF-16
    * units: Spark's `length`/`substr` count Unicode characters, and the
    * per-char grouping key in the reference plan is the code point's
    * one-char string.
    */
  def charEntropyMicrobitsImpl(s: UTF8String): Long = {
    val str = s.toString
    val counts = new java.util.HashMap[Integer, Integer]()
    var i = 0
    var len = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      len += 1
      val prev = counts.get(cp)
      counts.put(cp, if (prev == null) 1 else prev + 1)
    }
    if (len == 0) return 0L
    var sum = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().intValue()
      val p = c.toDouble / len.toDouble
      // the reference plan's term: round((-p * LOG2(p)) * 1e6, 0) with
      // LOG2 = math.log(x)/math.log(2) and Spark's Round = BigDecimal
      // HALF_UP on the double — replicated API-for-API
      val term = (-p * (math.log(p) / math.log(2.0))) * 1e6
      sum += java.math.BigDecimal.valueOf(term)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    }
    sum
  }

  // ---- Column wrappers ----

  def char_entropy_microbits(text: Column): Column =
    bridge.column(CharEntropyMicrobits(bridge.expression(text)))

  def float_dot(a: Column, b: Column): Column =
    bridge.column(FloatVecDot(
      bridge.expression(a), bridge.expression(b)))

  def simhash64(toks: Column): Column =
    bridge.column(SimHash64(bridge.expression(toks)))

  def minhash_signature(shingles: Column, as: Seq[Long], bs: Seq[Long], prime: Long): Column =
    bridge.column(MinHashSignature(
      bridge.expression(shingles), as, bs, prime))

  def srp_signature(vec: Column, planes: Seq[Seq[Double]]): Column =
    bridge.column(SrpSignature(bridge.expression(vec),
      planes.flatten.toArray, planes.length))

  def srp_band_keys(vec: Column, planes: Seq[Seq[Double]],
                    bands: Int, bitsPerBand: Int): Column =
    bridge.column(SrpBandKeys(bridge.expression(vec),
      planes.flatten.toArray, bands, bitsPerBand))

  def nearest_cells(vec: Column, cents: Array[Float],
                    centNorms: Array[Double], n: Int): Column =
    bridge.column(NearestCells(bridge.expression(vec), cents, centNorms, n))

  def token_ngrams(toks: Column, n: Int, distinct: Boolean = false): Column =
    bridge.column(TokenNGrams(bridge.expression(toks), n, distinct))

  def pq_codes(vec: Column, codebooks: Array[Array[Seq[Float]]]): Column = {
    val (cb, hv, ofs, subDim) = pqFlatten(codebooks)
    bridge.column(PqCodes(bridge.expression(vec), cb, hv, ofs, subDim))
  }

  def pq_nearest_code(sub: Column, j: Column,
                      codebooks: Array[Array[Seq[Float]]]): Column = {
    val (cb, hv, ofs, subDim) = pqFlatten(codebooks)
    bridge.column(PqNearestCode(
      bridge.expression(sub), bridge.expression(j), cb, hv, ofs, subDim))
  }

  /** Flatten a ragged per-subspace codebook into the [[PqCodes]] model
    * layout. `halves` uses the SAME ascending-index `Seq.sum` the old
    * unrolled spelling computed its ½‖cw‖² literals with, so scores
    * stay bit-identical.
    */
  private def pqFlatten(cbs: Array[Array[Seq[Float]]])
      : (Array[Float], Array[Double], Array[Int], Int) = {
    require(cbs.nonEmpty && cbs.forall(_.nonEmpty),
      "pq model: every subspace needs at least one codeword")
    val subDim = cbs.head.head.length
    require(cbs.forall(_.forall(_.length == subDim)),
      s"pq model: ragged codeword width (expected $subDim)")
    val offsets = cbs.scanLeft(0)(_ + _.length)
    val flat = new Array[Float](offsets.last * subDim)
    var w = 0
    cbs.foreach(_.foreach { cw => cw.foreach { x => flat(w) = x; w += 1 } })
    val halves = cbs.flatMap(_.map(cw =>
      cw.map(x => x.toDouble * x.toDouble).sum / 2.0))
    (flat, halves, offsets, subDim)
  }

  /** Equi-population rank of a double against sorted quantile
    * `boundaries`: the count of boundaries ≤ x (an upper-bound binary
    * search, O(log B) per row). The `aggregate`-HOF spelling is
    * CodegenFallback and walks all B boundaries interpreted — on a
    * re-layout pass that touches EVERY row of the table (z-ordering,
    * graft.etl.Layout) that interpretation dominated the write.
    */
  case class BucketRank(child: Expression, boundaries: Array[Double])
      extends UnaryExpression {

    require(boundaries.nonEmpty, "bucket_rank: need at least one boundary")

    override def dataType: DataType = IntegerType
    override def nullIntolerant: Boolean = true

    override protected def nullSafeEval(input: Any): Any = {
      val x = input.asInstanceOf[Double]
      var lo = 0
      var hi = boundaries.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (boundaries(mid) <= x) lo = mid + 1 else hi = mid
      }
      lo
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val bs = ctx.addReferenceObj("boundaries", boundaries, "double[]")
      nullSafeCodeGen(ctx, ev, x => {
        val lo = ctx.freshName("lo")
        val hi = ctx.freshName("hi")
        val mid = ctx.freshName("mid")
        s"""
           |int $lo = 0;
           |int $hi = $bs.length;
           |while ($lo < $hi) {
           |  int $mid = ($lo + $hi) >>> 1;
           |  if ($bs[$mid] <= $x) { $lo = $mid + 1; } else { $hi = $mid; }
           |}
           |${ev.value} = $lo;
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  def bucket_rank(c: Column, boundaries: Array[Double]): Column =
    bridge.column(BucketRank(bridge.expression(c), boundaries))
}
