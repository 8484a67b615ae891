package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd winnowing window-minima kernel. The built-in formulation in
  * `analytics.TextQueries.winnowFromGrams` (transform + slice + array_min)
  * is O(n·w) with a fresh array allocation per window; this kernel is the
  * classic monotonic-deque sliding minimum — O(n) per document, zero
  * allocation beyond the output — with first-occurrence de-duplication
  * fused in. The built-in form is retained as the agreement oracle
  * (same convention as the legacy LSH formulation in VectorSim).
  */
object WinnowExprs {

  /** `winnow_mins(grams)`: de-duplicated minima of each sliding window of
    * `w` entries, in first-occurrence order — bit-identical to
    * `winnowFromGrams`. Arrays shorter than `w` yield their single
    * global minimum.
    */
  def winnowMins(grams: Column, w: Int): Column =
    org.apache.spark.sql.GraftShim.column(
      WinnowMins(org.apache.spark.sql.GraftShim.expression(grams), w))

  /** `winnow_select(grams)`: the selected gram STRINGS — for each sliding
    * window of `w` grams, the gram whose `xxhash64` (seed 42, same kernel
    * as Spark's `xxhash64`) is the window minimum, de-duplicated by hash
    * in first-occurrence order. `winnowMins(transform(g, xxhash64), w)`
    * gives the same selection as hash values; this variant keeps the
    * strings so collisions can be blocked on and verified EXACTLY
    * downstream (the substring-dedup pair join compares gram strings, not
    * hashes). Arrays shorter than `w` yield the gram attaining the global
    * min. One O(n) pass: hashing, the monotonic deque, and dedup fused.
    */
  def winnowSelect(grams: Column, w: Int): Column =
    org.apache.spark.sql.GraftShim.column(
      WinnowSelect(org.apache.spark.sql.GraftShim.expression(grams), w))

  /** `winnow_select_grams(text)`: [[winnowSelect]] fused with char-`k`-gram
    * generation — semantically identical to
    * `winnowSelect(transform(sequence(...), substr(text, i, k)), w)` (docs
    * shorter than `k` chars yield the whole text as their one gram), but
    * the hashes are computed IN PLACE over the text's UTF-8 bytes via a
    * char→byte offset walk, and gram strings are allocated only for the
    * ~2/(w+1) selected winners. The composed form materializes every gram
    * as a string first (measured 2.5 s of q83's 5.6 s at sf0.1); this
    * kernel removes that cost and is agreement-tested against it.
    */
  def winnowSelectGrams(text: Column, k: Int, w: Int): Column =
    org.apache.spark.sql.GraftShim.column(
      WinnowSelectGrams(org.apache.spark.sql.GraftShim.expression(text), k, w))
}

case class WinnowMins(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, "window must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_mins"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> input, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n == 0) return UnsafeArrayData.fromPrimitiveArray(Array.empty[Long])
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    val seen = new java.util.HashSet[Long]()
    if (n < w) {
      var m = a.getLong(0)
      var i = 1
      while (i < n) { val v = a.getLong(i); if (v < m) m = v; i += 1 }
      out += m
    } else {
      // monotonic deque of indices with increasing values
      val dq = new Array[Int](n)
      var head = 0; var tail = 0 // [head, tail)
      var j = 0
      while (j < n) {
        while (tail > head && a.getLong(dq(tail - 1)) >= a.getLong(j)) tail -= 1
        dq(tail) = j; tail += 1
        if (dq(head) <= j - w) head += 1
        if (j >= w - 1) {
          val m = a.getLong(dq(head))
          if (seen.add(m)) out += m
        }
        j += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val uad = classOf[UnsafeArrayData].getName
      val n = ctx.freshName("n"); val outBuf = ctx.freshName("outBuf")
      val outLen = ctx.freshName("outLen"); val seen = ctx.freshName("seen")
      val dq = ctx.freshName("dq"); val head = ctx.freshName("head")
      val tail = ctx.freshName("tail"); val j = ctx.freshName("j")
      val m = ctx.freshName("m"); val i = ctx.freshName("i")
      val res = ctx.freshName("res")
      s"""
        final int $n = $a.numElements();
        long[] $outBuf = new long[$n == 0 ? 1 : $n];
        int $outLen = 0;
        if ($n > 0 && $n < $w) {
          long $m = $a.getLong(0);
          for (int $i = 1; $i < $n; $i++) {
            if ($a.getLong($i) < $m) $m = $a.getLong($i);
          }
          $outBuf[$outLen++] = $m;
        } else if ($n > 0) {
          final java.util.HashSet<Long> $seen = new java.util.HashSet<Long>();
          final int[] $dq = new int[$n];
          int $head = 0, $tail = 0;
          for (int $j = 0; $j < $n; $j++) {
            while ($tail > $head && $a.getLong($dq[$tail - 1]) >= $a.getLong($j)) $tail--;
            $dq[$tail++] = $j;
            if ($dq[$head] <= $j - $w) $head++;
            if ($j >= $w - 1) {
              final long $m = $a.getLong($dq[$head]);
              if ($seen.add($m)) $outBuf[$outLen++] = $m;
            }
          }
        }
        final long[] $res = new long[$outLen];
        System.arraycopy($outBuf, 0, $res, 0, $outLen);
        ${ev.value} = $uad.fromPrimitiveArray($res);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): WinnowMins =
    copy(child = newChild)
}

case class WinnowSelect(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, "window must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "winnow_select"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      require(!a.isNullAt(i), s"$prettyName: null gram at index $i")
      hs(i) = XXH64.hashUTF8String(a.getUTF8String(i), 42L); i += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    if (n < w) {
      var mi = 0
      var j = 1
      while (j < n) { if (hs(j) < hs(mi)) mi = j; j += 1 }
      out += a.getUTF8String(mi).clone()
    } else {
      val seen = new java.util.HashSet[Long]()
      val dq = new Array[Int](n)
      var head = 0; var tail = 0 // [head, tail)
      var j = 0
      while (j < n) {
        while (tail > head && hs(dq(tail - 1)) >= hs(j)) tail -= 1
        dq(tail) = j; tail += 1
        if (dq(head) <= j - w) head += 1
        if (j >= w - 1 && seen.add(hs(dq(head)))) out += a.getUTF8String(dq(head)).clone()
        j += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = classOf[XXH64].getName
      val gad = classOf[GenericArrayData].getName
      val utf8 = classOf[UTF8String].getName
      val n = ctx.freshName("n"); val hs = ctx.freshName("hs")
      val outBuf = ctx.freshName("outBuf"); val outLen = ctx.freshName("outLen")
      val seen = ctx.freshName("seen"); val dq = ctx.freshName("dq")
      val head = ctx.freshName("head"); val tail = ctx.freshName("tail")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val mi = ctx.freshName("mi"); val res = ctx.freshName("res")
      s"""
        final int $n = $a.numElements();
        final long[] $hs = new long[$n];
        for (int $i = 0; $i < $n; $i++) {
          if ($a.isNullAt($i)) {
            throw new IllegalArgumentException("winnow_select: null gram at index " + $i);
          }
          $hs[$i] = $xxh.hashUTF8String($a.getUTF8String($i), 42L);
        }
        $utf8[] $outBuf = new $utf8[$n == 0 ? 1 : $n];
        int $outLen = 0;
        if ($n > 0 && $n < $w) {
          int $mi = 0;
          for (int $i = 1; $i < $n; $i++) { if ($hs[$i] < $hs[$mi]) $mi = $i; }
          $outBuf[$outLen++] = $a.getUTF8String($mi).clone();
        } else if ($n > 0) {
          final java.util.HashSet<Long> $seen = new java.util.HashSet<Long>();
          final int[] $dq = new int[$n];
          int $head = 0, $tail = 0;
          for (int $j = 0; $j < $n; $j++) {
            while ($tail > $head && $hs[$dq[$tail - 1]] >= $hs[$j]) $tail--;
            $dq[$tail++] = $j;
            if ($dq[$head] <= $j - $w) $head++;
            if ($j >= $w - 1 && $seen.add($hs[$dq[$head]])) {
              $outBuf[$outLen++] = $a.getUTF8String($dq[$head]).clone();
            }
          }
        }
        final Object[] $res = new Object[$outLen];
        System.arraycopy($outBuf, 0, $res, 0, $outLen);
        ${ev.value} = new $gad($res);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): WinnowSelect =
    copy(child = newChild)
}

case class WinnowSelectGrams(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1, "gram length must be >= 1")
  require(w >= 1, "window must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "winnow_select_grams"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val t = input.asInstanceOf[UTF8String]
    val nb = t.numBytes()
    // char-start byte offsets: offs(c) = byte offset of char c; offs(nChars) = nb
    val offs = new Array[Int](nb + 1)
    var nChars = 0
    var o = 0
    while (o < nb) {
      offs(nChars) = o
      o += UTF8String.numBytesForFirstByte(t.getByte(o))
      nChars += 1
    }
    offs(nChars) = nb
    if (nChars < k) return new GenericArrayData(Array[Any](t.clone()))
    val nG = nChars - k + 1
    val hs = new Array[Long](nG)
    val base = t.getBaseObject
    val baseOff = t.getBaseOffset
    var i = 0
    while (i < nG) {
      hs(i) = XXH64.hashUnsafeBytes(base, baseOff + offs(i), offs(i + k) - offs(i), 42L)
      i += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    if (nG < w) {
      var mi = 0
      var j = 1
      while (j < nG) { if (hs(j) < hs(mi)) mi = j; j += 1 }
      out += t.substring(mi, mi + k)
    } else {
      val seen = new java.util.HashSet[Long]()
      val dq = new Array[Int](nG)
      var head = 0; var tail = 0 // [head, tail)
      var j = 0
      while (j < nG) {
        while (tail > head && hs(dq(tail - 1)) >= hs(j)) tail -= 1
        dq(tail) = j; tail += 1
        if (dq(head) <= j - w) head += 1
        if (j >= w - 1 && seen.add(hs(dq(head)))) {
          val s = dq(head)
          out += t.substring(s, s + k)
        }
        j += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val xxh = classOf[XXH64].getName
      val gad = classOf[GenericArrayData].getName
      val utf8 = classOf[UTF8String].getName
      val nb = ctx.freshName("nb"); val offs = ctx.freshName("offs")
      val nChars = ctx.freshName("nChars"); val o = ctx.freshName("o")
      val nG = ctx.freshName("nG"); val hs = ctx.freshName("hs")
      val base = ctx.freshName("base"); val baseOff = ctx.freshName("baseOff")
      val outBuf = ctx.freshName("outBuf"); val outLen = ctx.freshName("outLen")
      val seen = ctx.freshName("seen"); val dq = ctx.freshName("dq")
      val head = ctx.freshName("head"); val tail = ctx.freshName("tail")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val mi = ctx.freshName("mi"); val s = ctx.freshName("s")
      val res = ctx.freshName("res")
      s"""
        final int $nb = $t.numBytes();
        final int[] $offs = new int[$nb + 1];
        int $nChars = 0;
        for (int $o = 0; $o < $nb; ) {
          $offs[$nChars++] = $o;
          $o += $utf8.numBytesForFirstByte($t.getByte($o));
        }
        $offs[$nChars] = $nb;
        if ($nChars < $k) {
          ${ev.value} = new $gad(new Object[] { $t.clone() });
        } else {
          final int $nG = $nChars - $k + 1;
          final long[] $hs = new long[$nG];
          final Object $base = $t.getBaseObject();
          final long $baseOff = $t.getBaseOffset();
          for (int $i = 0; $i < $nG; $i++) {
            $hs[$i] = $xxh.hashUnsafeBytes($base, $baseOff + $offs[$i],
              $offs[$i + $k] - $offs[$i], 42L);
          }
          $utf8[] $outBuf = new $utf8[$nG];
          int $outLen = 0;
          if ($nG < $w) {
            int $mi = 0;
            for (int $i = 1; $i < $nG; $i++) { if ($hs[$i] < $hs[$mi]) $mi = $i; }
            $outBuf[$outLen++] = $t.substring($mi, $mi + $k);
          } else {
            final java.util.HashSet<Long> $seen = new java.util.HashSet<Long>();
            final int[] $dq = new int[$nG];
            int $head = 0, $tail = 0;
            for (int $j = 0; $j < $nG; $j++) {
              while ($tail > $head && $hs[$dq[$tail - 1]] >= $hs[$j]) $tail--;
              $dq[$tail++] = $j;
              if ($dq[$head] <= $j - $w) $head++;
              if ($j >= $w - 1 && $seen.add($hs[$dq[$head]])) {
                final int $s = $dq[$head];
                $outBuf[$outLen++] = $t.substring($s, $s + $k);
              }
            }
          }
          final Object[] $res = new Object[$outLen];
          System.arraycopy($outBuf, 0, $res, 0, $outLen);
          ${ev.value} = new $gad($res);
        }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): WinnowSelectGrams =
    copy(child = newChild)
}
