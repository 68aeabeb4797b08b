package graft.expressions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise sum of integral arrays — the grouped VECTOR aggregation a
  * centroid computation needs, as a native Catalyst aggregate (SURVEY §2.11:
  * the "UDAF" surface without a UDAF — a `TypedImperativeAggregate` runs
  * inside the hash-aggregate operator with map-side partial aggregation, so
  * only one `long[dim]` per group rides the shuffle, never the vectors).
  *
  * Integer accumulation is associative and overflow-free for any realistic
  * corpus (int8 codes × 2⁵⁵ rows), so the result is value-exact on any
  * engine and any partitioning — the reason centroids here aggregate
  * QUANTIZED codes, not float embeddings, whose addition order would change
  * the low bits.
  *
  * All rows in a group must share one dimension (the first row fixes it;
  * a mismatch throws rather than silently truncating). Null arrays are
  * skipped; null elements count as 0.
  */
case class VecSumLong(child: Expression,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(ByteType | ShortType | IntegerType | LongType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(s"vec_sum_long expects array<integral>, got $t")
  }

  // lazy: child.dataType throws while the plan is unresolved, and case-class
  // construction happens well before analysis binds the attribute
  private lazy val elemType: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case _ => NullType
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "vec_sum_long"

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  private def elemAt(a: ArrayData, i: Int): Long = elemType match {
    case ByteType    => a.getByte(i).toLong
    case ShortType   => a.getShort(i).toLong
    case IntegerType => a.getInt(i).toLong
    case LongType    => a.getLong(i)
    case _           => 0L
  }

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val buf =
      if (buffer.length == 0) new Array[Long](n)
      else {
        require(buffer.length == n,
          s"vec_sum_long: dimension mismatch (${buffer.length} vs $n)")
        buffer
      }
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) buf(i) += elemAt(arr, i)
      i += 1
    }
    buf
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    if (other.length == 0) return buffer
    if (buffer.length == 0) return other
    require(buffer.length == other.length,
      s"vec_sum_long: dimension mismatch (${buffer.length} vs ${other.length})")
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any =
    if (buffer.length == 0) null else new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().put(buffer)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSumLong =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSumLong =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
