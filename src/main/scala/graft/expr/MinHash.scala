package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** One-pass MinHash signature of a shingle array: `numHashes` minima of
  * the deterministic family `hash_j(s) = xxhash64(xxhash64(s), j)` —
  * BIT-IDENTICAL to the Column formula
  * `aggregate(transform(sh, s => xxhash64(s)), repeat(MaxValue),
  * (acc, h) => zip_with(acc, 0..n-1, (m, j) => least(m, xxhash64(h, j))))`
  * that it replaces (MinHashSpec proves equality; the Verify dump and the
  * DuckDB band-join oracles depend on the exact hash values).
  *
  * Why an Expression and not the Column formula: higher-order functions
  * have no codegen — the HOF chain is interpreted per element AND
  * allocates a fresh `numHashes`-long array per shingle (the zip_with
  * accumulator), so a 300-shingle doc churns ~300 × 64-slot arrays plus
  * expression-tree walks. This loop hashes each shingle string once,
  * derives the 64 family members with cheap int-mixes, and keeps one
  * flat minima array per ROW — measured (sf0.1, 5k docs, 64 hashes,
  * best-of-3): signature math 1.00 s → 0.07 s (≈14×); whole signature
  * build incl. shingling 1.39 s → 0.46 s, leaving the wordShingles HOF
  * as the remaining cost.
  *
  * Hash-family replication detail: Spark's `xxhash64(c)` is
  * XXH64.hashUnsafeBytes(bytes, seed=42) for a string and
  * XXH64.hashLong/hashInt(v, prevHash) folded left per argument type, with a NULL
  * argument leaving the running hash unchanged — all reproduced exactly,
  * including null shingle elements hashing to the bare seed.
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes > 0, s"minhash_sig: numHashes must be positive: $numHashes")

  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckSuccess
      case t => TypeCheckFailure(s"shingles must be ARRAY<STRING>, got $t")
    }
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      // xxhash64(NULL) leaves the running hash at the seed
      val hs = if (arr.isNullAt(i)) 42L else {
        val s = arr.getUTF8String(i)
        XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      }
      val inner = XXH64.hashLong(hs, 42L)
      var j = 0
      while (j < numHashes) {
        // the HOF formula's `sequence(0, n-1)` yields INT elements, so the
        // family hashes j with hashInt — hashLong(j) is a DIFFERENT family
        val v = XXH64.hashInt(j, inner)
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xxh = classOf[XXH64].getName
    val mins = ctx.freshName("mins")
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val hs = ctx.freshName("hs")
    val inner = ctx.freshName("inner")
    val v = ctx.freshName("v")
    val s = ctx.freshName("s")
    nullSafeCodeGen(ctx, ev, arrV => {
      s"""
      long[] $mins = new long[$numHashes];
      java.util.Arrays.fill($mins, Long.MAX_VALUE);
      for (int $i = 0; $i < $arrV.numElements(); $i++) {
        long $hs = 42L;
        if (!$arrV.isNullAt($i)) {
          org.apache.spark.unsafe.types.UTF8String $s = $arrV.getUTF8String($i);
          $hs = $xxh.hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(),
            $s.numBytes(), 42L);
        }
        long $inner = $xxh.hashLong($hs, 42L);
        for (int $j = 0; $j < $numHashes; $j++) {
          long $v = $xxh.hashInt($j, $inner);
          if ($v < $mins[$j]) $mins[$j] = $v;
        }
      }
      ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** Column-API entry point. */
  def minhash_sig(shingles: Column, numHashes: Int): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(MinHashSig(GraftBridge.expression(shingles), numHashes))
  }
}

/** [[MinHashSig]] over PRE-HASHED shingles (`array<long>` of
  * `xxhash64(shingle)`): hs is taken from the input instead of hashing the
  * string — the rest of the family derivation (inner = hashLong(hs, 42),
  * member j = hashInt(j, inner)) is identical, so
  * `MinHashSigFromHashes(transform(sh, s ⇒ xxhash64(s)))` is BIT-EQUAL to
  * `MinHashSig(sh)` (MinHashSpec proves it). Exists because the batch
  * near-dup path now keeps only the hashed shingle frame (8-byte elements
  * through the checkpoint and both verify-join shuffles, vs ~100-byte
  * strings) — the signature build must work from the same frame. A null
  * element contributes hs = 42 (the seed), matching xxhash64(NULL)'s
  * running-hash behavior in the string form.
  */
case class MinHashSigFromHashes(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes > 0, s"minhash_sig_hashed: numHashes must be positive: $numHashes")

  override def prettyName: String = "minhash_sig_hashed"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckSuccess
      case t => TypeCheckFailure(s"hashed shingles must be ARRAY<BIGINT>, got $t")
    }
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val hs = if (arr.isNullAt(i)) 42L else arr.getLong(i)
      val inner = XXH64.hashLong(hs, 42L)
      var j = 0
      while (j < numHashes) {
        val v = XXH64.hashInt(j, inner)
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xxh = classOf[XXH64].getName
    val mins = ctx.freshName("mins")
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val hs = ctx.freshName("hs")
    val inner = ctx.freshName("inner")
    val v = ctx.freshName("v")
    nullSafeCodeGen(ctx, ev, arrV => {
      s"""
      long[] $mins = new long[$numHashes];
      java.util.Arrays.fill($mins, Long.MAX_VALUE);
      for (int $i = 0; $i < $arrV.numElements(); $i++) {
        long $hs = $arrV.isNullAt($i) ? 42L : $arrV.getLong($i);
        long $inner = $xxh.hashLong($hs, 42L);
        for (int $j = 0; $j < $numHashes; $j++) {
          long $v = $xxh.hashInt($j, $inner);
          if ($v < $mins[$j]) $mins[$j] = $v;
        }
      }
      ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigFromHashes =
    copy(child = newChild)
}

object MinHashSigFromHashes {
  /** Column-API entry point. */
  def minhash_sig_hashed(hashedShingles: Column, numHashes: Int): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(
      MinHashSigFromHashes(GraftBridge.expression(hashedShingles), numHashes))
  }
}

/** Positions where two minhash signatures agree — the codegen'd twin of
  * `aggregate(zip_with(a, b, (x, y) ⇒ x = y ? 1 : 0), 0, +)` (kept as the
  * MinHashSpec cross-check formula). This runs once per PRE-DISTINCT
  * banded candidate row — an exact-duplicate cluster of c docs emits
  * ~c²/2 × bands such rows before the pair-dedup exchange, so at
  * million-doc scale the interpreted HOF pair (fresh lambda frames and a
  * zipped array per row) was the band join's dominant cost. Unequal
  * lengths agree only over the common prefix (zip_with's null padding
  * never matches); null elements (cannot occur — signatures are built
  * containsNull = false) count as disagreement, like the HOF's
  * `when(x === y, …)` null semantics.
  */
case class SigAgreement(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "sig_agreement"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckSuccess
      case (l, r) => TypeCheckFailure(s"signatures must be ARRAY<BIGINT>, got $l, $r")
    }
  }

  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i) && x.getLong(i) == y.getLong(i)) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val c = ctx.freshName("c")
    nullSafeCodeGen(ctx, ev, (xa, ya) => {
      s"""
      int $n = Math.min($xa.numElements(), $ya.numElements());
      int $c = 0;
      for (int $i = 0; $i < $n; $i++) {
        if (!$xa.isNullAt($i) && !$ya.isNullAt($i) &&
            $xa.getLong($i) == $ya.getLong($i)) $c++;
      }
      ${ev.value} = $c;
      """
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): SigAgreement =
    copy(left = newLeft, right = newRight)
}

object SigAgreement {
  /** Column-API entry point. */
  def sig_agreement(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(
      SigAgreement(GraftBridge.expression(a), GraftBridge.expression(b)))
  }
}

/** Distinct word k-shingles of a lowercased text column — the codegen'd
  * twin of the HOF formula `array_distinct(flatten(transform(array(split(
  * lower(text), "\\s+")), w => filter(transform(seq, i => join(slice))))))`
  * (kept as `Dedup.wordShinglesHof`, the MinHashSpec cross-check).
  *
  * Semantics parity: `lower` is `UTF8String.toLowerCase` (the Lower
  * expression's own call); the `split(text, "\\s+")` tokenization is
  * replaced by a UTF-8 BYTE scan that is provably equivalent — Java's
  * `\s` without UNICODE_CHARACTER_CLASS is exactly the six ASCII bytes
  * {space, \t, \n, \x0B, \f, \r}, and multi-byte UTF-8 sequences never
  * contain bytes < 0x80, so scanning bytes for whitespace runs yields the
  * same segments as the regex on UTF-16 chars, including the leading
  * empty word after leading whitespace and the trailing empty word with
  * limit -1. Shingles are built by copying word byte-slices with single
  * spaces (no regex machinery, no UTF-16 round-trip, no per-word
  * UTF8String churn); a LinkedHashSet reproduces array_distinct's
  * first-occurrence order. MinHashSpec proves bit-equality on real docs
  * and whitespace/unicode edge cases. Measured (sf0.1, 5k docs,
  * best-of-3): shingling 0.38 s → 0.26 s, full signature build 0.47 s →
  * 0.29 s on top of MinHashSig's own win (the remainder is the parquet
  * scan + toLowerCase + the inherent shingle-string building).
  */
case class WordShingles(child: Expression, k: Int)
    extends UnaryExpression {

  require(k > 0, s"word_shingles: k must be positive: $k")

  override def prettyName: String = "word_shingles"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (child.dataType == StringType) TypeCheckSuccess
    else TypeCheckFailure(s"text must be STRING, got ${child.dataType}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, textV =>
      s"${ev.value} = graft.expr.WordShingles.compute($textV, $k);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  import org.apache.spark.unsafe.types.UTF8String

  private def isWs(b: Byte): Boolean =
    b == 0x20 || b == 0x09 || b == 0x0a || b == 0x0b || b == 0x0c || b == 0x0d

  /** Static helper shared by eval and generated code. Word boundaries are
    * tracked in a growable interleaved int[] (start, end, start, end, …) —
    * this is the per-row hot path, so no boxed collections.
    */
  def compute(text: UTF8String, k: Int): ArrayData = {
    val bytes = text.toLowerCase.getBytes
    val n = bytes.length
    // word boundaries: segments between ASCII-whitespace runs, leading and
    // trailing empty segments kept — exactly split(s, "\s+", -1)
    // grow-and-store is inlined at both call sites: a nested def capturing
    // the mutated locals would lift bounds/nb into ObjectRef/IntRef heap
    // boxes — per-row allocations in exactly this hot path
    var bounds = new Array[Int](32)
    var nb = 0
    var i = 0
    var segStart = 0
    while (i < n) {
      if (isWs(bytes(i))) {
        if (nb == bounds.length)
          bounds = java.util.Arrays.copyOf(bounds, nb * 2)
        bounds(nb) = segStart; bounds(nb + 1) = i; nb += 2
        while (i < n && isWs(bytes(i))) i += 1
        segStart = i
      } else i += 1
    }
    if (nb == bounds.length)
      bounds = java.util.Arrays.copyOf(bounds, nb * 2)
    bounds(nb) = segStart; bounds(nb + 1) = n; nb += 2
    val nWords = nb / 2
    val out = new java.util.LinkedHashSet[UTF8String]
    var w = 0
    while (w + k <= nWords) {
      var len = k - 1 // single-space joiners
      var j = w
      while (j < w + k) { len += bounds(2 * j + 1) - bounds(2 * j); j += 1 }
      val buf = new Array[Byte](len)
      var pos = 0
      j = w
      while (j < w + k) {
        if (j > w) { buf(pos) = 0x20; pos += 1 }
        val l = bounds(2 * j + 1) - bounds(2 * j)
        System.arraycopy(bytes, bounds(2 * j), buf, pos, l)
        pos += l
        j += 1
      }
      out.add(UTF8String.fromBytes(buf))
      w += 1
    }
    new GenericArrayData(out.toArray(Array.empty[AnyRef]))
  }

  /** Column-API entry point. */
  def word_shingles(text: Column, k: Int): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(WordShingles(GraftBridge.expression(text), k))
  }
}
