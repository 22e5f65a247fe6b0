package org.apache.spark.sql.graft

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSet, BoundReference, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode, GenerateOrdering, GenerateUnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSparkSession}
import org.apache.spark.sql.execution.{BlockingOperatorWithCodegen, CodegenSupport, SparkPlan, SparkStrategy, UnaryExecNode}

/** Logical per-key top-k: up to `k` rows per `keys` group, first in `order`.
  *
  * This is the whole-operator extension path (LogicalPlan → Strategy →
  * SparkPlan): the window-function formulation (`row_number() ≤ k`) must
  * fully SORT every partition — O(n log n) per partition plus sort spill;
  * this operator keeps a size-k bounded heap per key — O(n log k), no sort,
  * and shuffle-only memory bounded by (#keys-in-partition × k) rows.
  */
case class TopKPerKey(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Planner strategy mapping the logical node to its physical operators:
  * a map-side partial top-k below the (planner-inserted) exchange and the
  * final top-k above it — the partial-aggregation pattern. The shuffle then
  * carries at most (#keys-in-partition × k) rows per input partition
  * instead of every row, which is the difference that matters at 100 TB.
  */
class TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k,
        TopKPerKeyExec(keys, order, k, planLater(child), partial = true)) :: Nil
    case _ => Nil
  }
}

/** Optimizer rule for the custom operator: a filter that references only
  * the grouping keys keeps or drops whole groups, so it commutes with
  * per-group top-k — pushing it below the operator lets Catalyst carry it
  * all the way into the scan (predicate pushdown does the rest).
  */
object PushFilterThroughTopK extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, topk @ TopKPerKey(keys, _, _, child))
        if cond.deterministic &&
          f.condition.references.subsetOf(AttributeSet(keys.flatMap(_.references))) =>
      topk.copy(child = Filter(cond, child))
  }
}

/** Per-partition bounded-heap collector: the shared row sink behind both
  * the interpreted and the whole-stage-codegen'd partial pass. Retains at
  * most `k` rows per locally-seen key; rows are copied only when retained.
  */
final class TopKCollector(
    grouping: UnsafeProjection,
    ordering: Ordering[InternalRow],
    k: Int) {
  private val heapOrd = ordering.asInstanceOf[Ordering[UnsafeRow]]
  private val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]

  def insert(row: UnsafeRow): Unit = {
    val key = grouping(row)
    heaps.get(key) match {
      case None =>
        val h = mutable.PriorityQueue.empty[UnsafeRow](heapOrd)
        h += row.copy()
        heaps.put(key.copy(), h)
      case Some(h) =>
        if (h.size < k) {
          h += row.copy()
        } else if (ordering.compare(row, h.head) < 0) {
          h.dequeue()
          h += row.copy()
        }
    }
  }

  def result(): Iterator[UnsafeRow] =
    heaps.valuesIterator.flatMap(_.dequeueAll.reverseIterator)
}

/** @param partial map-side pass: no distribution requirement, prunes each
  *                input partition to ≤ k rows per locally-seen key. The
  *                final pass (partial = false) requires co-location and
  *                emits the exact per-key top-k. Top-k distributes over
  *                union, so the composition is exact (ties beyond the sort
  *                order are arbitrary, as with `row_number`).
  *
  * The partial pass participates in whole-stage codegen as a blocking
  * consumer (the `HashAggregate`/`Sort` pattern): the stage's generated
  * per-row loop feeds an [[TopKCollector]] directly — no iterator boundary
  * between the scan/filter/project chain and the heap insert — and the
  * drain loop above it hands pruned `UnsafeRow`s to the exchange. The final
  * pass stays interpreted: it sits directly under the shuffle read, where
  * there is no upstream chain to fuse with.
  */
case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan,
    partial: Boolean = false) extends UnaryExecNode with BlockingOperatorWithCodegen {

  override def output: Seq[Attribute] = child.output

  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKey"

  def newCollector(): TopKCollector = new TopKCollector(
    UnsafeProjection.create(keys, child.output),
    GenerateOrdering.generate(order, child.output).asInstanceOf[Ordering[InternalRow]],
    k)

  // ---- whole-stage codegen (both passes) ----
  // partial: fuses with the scan/filter/project chain below the exchange.
  // final: its child is the shuffle read (an InputAdapter row stream — the
  // row != null doConsume path), and the drain loop fuses with whatever
  // sits above the operator.
  override def supportCodegen: Boolean = true

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    child.asInstanceOf[CodegenSupport].inputRDDs()

  // the collector's generated-class field name, shared between doProduce
  // (which declares it) and doConsume (which inserts into it) — the same
  // member-variable handoff SortExec uses for its sorter
  @transient private var collectorTerm: String = _

  override def doProduce(ctx: CodegenContext): String = {
    val needToProcess =
      ctx.addMutableState(CodeGenerator.JAVA_BOOLEAN, "needProcess", v => s"$v = true;")
    val thisPlan = ctx.addReferenceObj("plan", this)
    collectorTerm = ctx.addMutableState(
      classOf[TopKCollector].getName, "topkCollector",
      v => s"$v = $thisPlan.newCollector();", forceInline = true)
    val iterTerm = ctx.addMutableState(
      "scala.collection.Iterator", "topkIter", forceInline = true)
    val addFuncName = ctx.freshName("addToTopKCollector")
    val addToCollector = ctx.addNewFunction(addFuncName,
      s"""
         |private void $addFuncName() throws java.io.IOException {
         |  ${child.asInstanceOf[CodegenSupport].produce(ctx, this)}
         |}
       """.stripMargin.trim)
    val outputRow = ctx.freshName("topkOutputRow")
    s"""
       |if ($needToProcess) {
       |  $addToCollector();
       |  $iterTerm = $collectorTerm.result();
       |  $needToProcess = false;
       |}
       |while ($limitNotReachedCond $iterTerm.hasNext()) {
       |  UnsafeRow $outputRow = (UnsafeRow) $iterTerm.next();
       |  ${consume(ctx, null, outputRow)}
       |  if (shouldStop()) return;
       |}
     """.stripMargin
  }

  override def doConsume(
      ctx: CodegenContext, input: Seq[ExprCode], row: ExprCode): String = {
    if (row != null) {
      s"""
         |${row.code}
         |$collectorTerm.insert((UnsafeRow) ${row.value});
       """.stripMargin
    } else {
      // materialize the child's column variables into an UnsafeRow for the
      // heap (the collector copies only rows it retains)
      val colExprs = child.output.zipWithIndex.map { case (attr, i) =>
        BoundReference(i, attr.dataType, attr.nullable)
      }
      val evaluateInputs = evaluateVariables(input)
      ctx.INPUT_ROW = null
      ctx.currentVars = input
      val code = GenerateUnsafeProjection.createCode(ctx, colExprs)
      s"""
         |${evaluateInputs.trim}
         |${code.code}
         |$collectorTerm.insert(${code.value});
       """.stripMargin
    }
  }

  /** Co-locate each key's rows (final pass only); no ordering requirement —
    * the heap replaces the sort the window formulation would force here.
    */
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) super.requiredChildDistribution
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val boundOrder = order
    val kk = k
    val keyExprs = keys
    child.execute().mapPartitionsInternal { it =>
      val grouping = UnsafeProjection.create(keyExprs, childOutput)
      val ordering = GenerateOrdering.generate(boundOrder, childOutput)
      // max-heap by sort order: head = worst retained row, evicted first
      val heapOrd = ordering.asInstanceOf[Ordering[InternalRow]]
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      it.foreach { row =>
        val key = grouping(row)
        heaps.get(key) match {
          case None =>
            val h = mutable.PriorityQueue.empty[InternalRow](heapOrd)
            h += row.copy()
            heaps.put(key.copy(), h)
          case Some(h) =>
            if (h.size < kk) {
              h += row.copy()
            } else if (ordering.compare(row, h.head) < 0) {
              h.dequeue()
              h += row.copy()
            }
        }
      }
      heaps.valuesIterator.flatMap(_.dequeueAll.reverseIterator)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** DataFrame-level API for the custom operator. */
object GraftOps {

  /** Up to `k` rows per key, first in the given sort order
    * (`orderBy` = (column name, descending?)). Emits no rank column.
    *
    * Expressions are bound to the analyzed child's attributes directly: the
    * Spark 4 Column API wraps expressions in `ColumnNodeExpression`s that
    * only the built-in Dataset operations convert, so a custom logical node
    * must resolve its own references.
    */
  def topKPerKey(
      df: DataFrame,
      keys: Seq[String],
      orderBy: Seq[(String, Boolean)],
      k: Int): DataFrame = {
    val child = df.queryExecution.analyzed
    def attr(name: String): Attribute =
      child.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${child.output.map(_.name).mkString(", ")}"))
    val sortOrders = orderBy.map { case (name, desc) =>
      SortOrder(attr(name), if (desc) Descending else Ascending)
    }
    val spark = df.sparkSession.asInstanceOf[ClassicSparkSession]
    // strategy + optimizer rule are idempotently registered on first use
    if (!spark.experimental.extraStrategies.exists(_.isInstanceOf[TopKStrategy])) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ new TopKStrategy
    }
    if (!spark.experimental.extraOptimizations.contains(PushFilterThroughTopK)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ PushFilterThroughTopK
    }
    Dataset.ofRows(spark, TopKPerKey(keys.map(attr), sortOrders, k, child))
  }
}
