package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Elementwise minimum over ARRAY<BIGINT> rows — the native AGGREGATE
  * completing the extension-surface matrix next to the scalar
  * expressions (TextExpressions/VectorExpressions) and the optimizer
  * rule (PushFilterIntoExplode): Spark has min/array_min but no
  * "min each component across rows".
  *
  * The motivating use is MinHash algebra: the elementwise min of
  * per-document signature arrays IS the signature of the documents'
  * UNION of shingles (min is associative/commutative per component), so
  * grouping by source and folding signatures gives a corpus-level
  * sketch in one combinable aggregate — shuffle traffic is one
  * 16-element array per (partition, group), never the shingle sets.
  * q119 consumes this for cross-source similarity.
  *
  * Semantics: null and EMPTY input arrays are ignored (a short text
  * yields no shingles — it contributes nothing, matching min over an
  * empty set); mismatched lengths fail fast (signatures from different
  * configurations must not silently zip); a group with no contributing
  * rows evaluates to null.
  */
case class ArrayMinAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def prettyName: String = "graft_array_min_agg"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    InputCheck.result(InputCheck.arrayOfLong(child, prettyName, 1))

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  private def minInto(buf: Array[Long], other: Array[Long]): Array[Long] = {
    if (other.isEmpty) return buf
    if (buf.isEmpty) return other
    require(buf.length == other.length,
      s"$prettyName: mismatched array lengths ${buf.length} vs ${other.length}")
    var i = 0
    while (i < buf.length) {
      if (other(i) < buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val arr = v.asInstanceOf[ArrayData]
      // the SQL registration accepts ARRAY<BIGINT> with nullable elements,
      // and UnsafeArrayData.toLongArray reads a null slot as raw 0 — which
      // would silently beat every real MinHash value. Fail fast instead,
      // like the mismatched-length case.
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        require(!arr.isNullAt(i),
          s"$prettyName: null array element at index $i — signatures must be null-free")
        i += 1
      }
      minInto(buffer, arr.toLongArray())
    }
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] =
    minInto(buffer, other)

  override def eval(buffer: Array[Long]): Any =
    if (buffer.isEmpty) null else new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buffer.length)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ArrayMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ArrayMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ArrayMinAgg =
    copy(child = newChild)
}
