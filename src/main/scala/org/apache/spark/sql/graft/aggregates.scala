package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.SQLOrderingUtil
import org.apache.spark.sql.types.{AbstractDataType, AnyDataType, DataType, DoubleType, IntegerType, LongType, StringType, TypeCollection}
import org.apache.spark.unsafe.types.UTF8String

/** `max_by(value, struct(ts, id))` as a [[TypedImperativeAggregate]] — the
  * engine's hottest aggregation shape (`gaugeLatest` and every PromQL
  * instant/last-over-time selector) rerouted from SortAggregate to
  * ObjectHashAggregate.
  *
  * WHY: the built-in `MaxBy` is declarative with a STRUCT-typed buffer
  * (the ordering key), and a struct is not an UnsafeRow-mutable field —
  * so every aggregation carrying it (plus the `any_value(labels)` map
  * buffers riding alongside) plans as SortAggregateExec: the whole corpus
  * is SORTED by (group key) before aggregating, per partition, on both
  * sides of the exchange. A TypedImperativeAggregate in the aggregate
  * list routes the plan through ObjectHashAggregateExec — hash
  * aggregation with object buffers, no sort — while every other aggregate
  * in the list (min/max/decimal sums/any_value) rides along unchanged.
  *
  * SEMANTICS — byte-identical to `max_by(value, struct(ts, id))`:
  *
  *  - the ordering is the struct's ascending comparison: `ts` first
  *    (nulls first — null loses to any non-null), then `id` as
  *    UTF8String unsigned-byte order (nulls first). `ts` may be
  *    int/long (integer compare) or double ([[SQLOrderingUtil
  *    .compareDoubles]] — Spark's own total order: -0.0 = 0.0, NaN
  *    greatest, exactly what the struct ordering uses);
  *  - a STRICTLY greater ordering key replaces the buffer (ties keep the
  *    first seen — `MaxBy.update`'s `>` exactly). Every engine call site
  *    carries a unique `id` per row, so ties cannot arise at all;
  *  - the built-in ignores rows whose ORDERING evaluates to null — here
  *    the ordering is a two-field struct literal, which is never null, so
  *    no row is ever skipped (null ts/id compare as above, like the
  *    struct's field comparison);
  *  - `value` is any data type (double/long/struct at the call sites),
  *    null preserved; an empty group yields null.
  *
  * The buffer serializes for the partial/final exchange as
  * `[flags][ts bits][id bytes][value as a 1-column UnsafeRow]` — one
  * candidate per group per input partition, the same map-side-combinable
  * shuffle shape as the declarative original.
  */
case class MaxByTsId(
    valueExpr: Expression,
    tsExpr: Expression,
    idExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MaxByTsId.Buf] with ExpectsInputTypes {

  import MaxByTsId.Buf

  override def children: Seq[Expression] = Seq(valueExpr, tsExpr, idExpr)
  override def inputTypes: Seq[AbstractDataType] =
    Seq(AnyDataType, TypeCollection(LongType, IntegerType, DoubleType), StringType)
  override def dataType: DataType = valueExpr.dataType
  override def nullable: Boolean = true
  override def prettyName: String = "max_by_ts_id"

  // ts comparison kind, resolved once at plan time: 0 = integral bits
  // compare as signed longs, 1 = double bits compare via Spark's total
  // order. Int inputs widen to long losslessly.
  private lazy val tsIsDouble: Boolean = tsExpr.dataType == DoubleType
  private lazy val tsIsInt: Boolean = tsExpr.dataType == IntegerType

  private def tsBitsOf(t: Any): Long =
    if (tsIsDouble) java.lang.Double.doubleToRawLongBits(t.asInstanceOf[Double])
    else if (tsIsInt) t.asInstanceOf[Int].toLong
    else t.asInstanceOf[Long]

  private def cmpTs(a: Long, b: Long): Int =
    if (tsIsDouble)
      SQLOrderingUtil.compareDoubles(
        java.lang.Double.longBitsToDouble(a), java.lang.Double.longBitsToDouble(b))
    else java.lang.Long.compare(a, b)

  /** struct(ts, id) ascending comparison of the candidate against the
    * buffer: > 0 iff the candidate is strictly greater (nulls first on
    * both fields, exactly the struct ordering's field comparison).
    */
  private def candidateWins(
      tsNull: Boolean, tsBits: Long, idNull: Boolean, id: UTF8String,
      b: Buf): Boolean = {
    val c1 =
      if (tsNull && b.tsNull) 0
      else if (tsNull) -1
      else if (b.tsNull) 1
      else cmpTs(tsBits, b.tsBits)
    if (c1 != 0) c1 > 0
    else {
      val c2 =
        if (idNull && b.idNull) 0
        else if (idNull) -1
        else if (b.idNull) 1
        else id.compareTo(b.id)
      c2 > 0
    }
  }

  override def createAggregationBuffer(): Buf = new Buf

  override def update(b: Buf, input: InternalRow): Buf = {
    val t = tsExpr.eval(input)
    val tsNull = t == null
    val tsBits = if (tsNull) 0L else tsBitsOf(t)
    val i = idExpr.eval(input)
    val idNull = i == null
    val id = if (idNull) null else i.asInstanceOf[UTF8String]
    if (!b.has || candidateWins(tsNull, tsBits, idNull, id, b)) {
      b.has = true
      b.tsNull = tsNull
      b.tsBits = tsBits
      b.idNull = idNull
      b.id = if (idNull) null else id.clone()
      val v = valueExpr.eval(input)
      b.vNull = v == null
      b.v = if (v == null) null else InternalRow.copyValue(v)
    }
    b
  }

  override def merge(b: Buf, o: Buf): Buf =
    if (o.has && (!b.has || candidateWins(o.tsNull, o.tsBits, o.idNull, o.id, b))) o
    else b

  override def eval(b: Buf): Any = if (!b.has || b.vNull) null else b.v

  private lazy val valueProj = UnsafeProjection.create(Array(dataType))
  private lazy val valueHolder =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)

  override def serialize(b: Buf): Array[Byte] = {
    if (!b.has) return Array.emptyByteArray
    val idBytes = if (b.idNull) Array.emptyByteArray else b.id.getBytes
    val valBytes =
      if (b.vNull) Array.emptyByteArray
      else {
        valueHolder.update(0, b.v)
        val ur = valueProj.apply(valueHolder)
        java.util.Arrays.copyOfRange(ur.getBytes, 0, ur.getSizeInBytes)
      }
    val out = java.nio.ByteBuffer.allocate(1 + 8 + 4 + idBytes.length + valBytes.length)
    var flags = 1
    if (b.tsNull) flags |= 2
    if (b.idNull) flags |= 4
    if (b.vNull) flags |= 8
    out.put(flags.toByte)
    out.putLong(b.tsBits)
    out.putInt(idBytes.length)
    out.put(idBytes)
    out.put(valBytes)
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val b = new Buf
    if (bytes.isEmpty) return b
    val in = java.nio.ByteBuffer.wrap(bytes)
    val flags = in.get()
    b.has = true
    b.tsNull = (flags & 2) != 0
    b.tsBits = in.getLong()
    b.idNull = (flags & 4) != 0
    val idLen = in.getInt()
    if (idLen > 0 || !b.idNull) {
      val idBytes = new Array[Byte](idLen)
      in.get(idBytes)
      b.id = if (b.idNull) null else UTF8String.fromBytes(idBytes)
    }
    b.vNull = (flags & 8) != 0
    if (!b.vNull) {
      val valBytes = new Array[Byte](in.remaining())
      in.get(valBytes)
      val ur = new UnsafeRow(1)
      ur.pointTo(valBytes, valBytes.length)
      b.v = InternalRow.copyValue(ur.get(0, dataType))
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MaxByTsId =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MaxByTsId =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MaxByTsId =
    copy(valueExpr = newChildren(0), tsExpr = newChildren(1), idExpr = newChildren(2))
}

object MaxByTsId {
  /** Mutable per-group state: the winning (ts, id) key and its value. */
  final class Buf {
    var has: Boolean = false
    var tsNull: Boolean = false
    var tsBits: Long = 0L
    var idNull: Boolean = false
    var id: UTF8String = null
    var vNull: Boolean = false
    var v: Any = null
  }
}
