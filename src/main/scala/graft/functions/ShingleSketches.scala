package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Map-side sketch expressions over a shingle array.
  *
  * Both MinHash signatures and SimHash fingerprints are per-row folds over
  * the document's shingle set — there is no reason to explode the shingles
  * and shuffle them into a groupBy: these expressions compute the whole
  * sketch in one generated call, so signature generation is embarrassingly
  * parallel and the only shuffle left in near-dup detection is the
  * candidate bucket join. At 100 TB that removes a |corpus|·|shingles|-row
  * shuffle per signature build.
  */
object ShingleSketches {
  private[functions] val MersenneP = 2147483647L // 2^31 - 1

  /** zlib CRC32 of the shingle's UTF-8 bytes, folded mod p — the shared
    * base hash of the MinHash permutation family. */
  private def baseHash(s: UTF8String): Long = {
    val crc = new java.util.zip.CRC32
    crc.update(s.getBytes)
    crc.getValue % MersenneP
  }

  /** MinHash signature: sig[i] = min over shingles of (a_i·h + b_i) mod p
    * with a_i = 2i+1 (odd), b_i = 7919·(i+1). */
  def minhash(shingles: ArrayData, numHashes: Int): ArrayData = {
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val m = shingles.numElements()
    var s = 0
    while (s < m) {
      val h = baseHash(shingles.getUTF8String(s))
      var i = 0
      while (i < numHashes) {
        val v = (h * (2L * i + 1) + 7919L * (i + 1)) % MersenneP
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      s += 1
    }
    new GenericArrayData(mins.map(v => if (v == Long.MaxValue) -1L else v))
  }

  /** 64-bit FNV-1a of the shingle bytes — the SimHash bit source. */
  private def fnv64(s: UTF8String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** SimHash: per-bit vote of every shingle's 64-bit hash; bit set iff the
    * vote is positive. */
  def simhash(shingles: ArrayData): Long = {
    val votes = new Array[Int](64)
    val m = shingles.numElements()
    var s = 0
    while (s < m) {
      val h = fnv64(shingles.getUTF8String(s))
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
      s += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }
}

/** MinHash signature of an array<string> shingle column → array<long>. */
case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"
  override protected def nullSafeEval(input: Any): Any =
    ShingleSketches.minhash(input.asInstanceOf[ArrayData], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleSketches.minhash($c, $numHashes)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** SimHash of an array<string> shingle column → long. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"
  override protected def nullSafeEval(input: Any): Any =
    ShingleSketches.simhash(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleSketches.simhash($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
