package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

import graft.model.Fidelity
import graft.store.Tables

/**
 * Materialized-view rewrite for the rollup pyramid (the optional
 * Catalyst Rule from SURVEY §7.3 / §4): a tumbling-window
 * min/max/sum/count aggregate over a REGISTERED store's raw table is
 * rewritten to a scan of the pre-computed rollup level — the query
 * reads ~10^d× less data and skips the aggregation entirely.
 *
 * Matches exactly the plan shape produced by `Rollup.aggregate`
 * (also reachable from SQL `GROUP BY dataset_id, ts_us div D * d`):
 *
 *   Aggregate [dataset_id, g], [dataset_id, g AS bucket_s,
 *       min(value), max(value), sum(value), count(1)]
 *   +- Project [..., ((ts_us div d*1e6) * d) AS g]
 *      +- Relation parquet <registered raw table>
 *
 * Sound because `Tables.ingestBatch` maintains every level
 * transactionally from the same batches (the store's invariant:
 * rollup state ≡ aggregate of raw state). Only exact level matches
 * rewrite; other durations keep the normal plan.
 */
object RollupCatalog {
  private val stores = new ConcurrentHashMap[String, String]()

  /** Key normalization for catalog matching. Relation paths arrive as
   *  URI paths (`LogicalRelation.location.rootPaths.head.toUri.getPath`);
   *  registered roots may be relative local paths — Hadoop `Path`
   *  normalizes separators/trailing slashes, and bare relative paths
   *  are anchored at the JVM working dir to match the URI form.
   */
  private def canon(p: String): String = {
    val hp = new org.apache.hadoop.fs.Path(p)
    if (hp.isAbsolute) hp.toString
    else new org.apache.hadoop.fs.Path(
      new java.io.File(".").getAbsoluteFile.getParent, p).toString
  }

  /** Register a store root so queries over its raw table rewrite. */
  def register(storeRoot: String): Unit =
    stores.put(canon(Tables.rawPath(storeRoot)), storeRoot)

  def storeForRawPath(rawPath: String): Option[String] =
    Option(stores.get(canon(rawPath)))

  def clear(): Unit = stores.clear()
}

case class RollupRewriteRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformDown {
      case agg: Aggregate => tryRewrite(agg).getOrElse(agg)
    }

  private def relationRawPath(plan: LogicalPlan): Option[String] =
    plan match {
      case lr: LogicalRelation =>
        lr.relation match {
          case fs: HadoopFsRelation =>
            fs.location.rootPaths.headOption.map(_.toUri.getPath)
          case _ => None
        }
      case _ => None
    }

  /** The bucket expression `(ts_us div d*1e6) * d` → duration d. */
  private def bucketDuration(e: Expression): Option[(Attribute, Long)] = e match {
    case Multiply(
        IntegralDivide(ts: AttributeReference, Literal(div: Long, _), _),
        Literal(d, _), _) =>
      val dl = d match { case l: Long => l; case i: Int => i.toLong; case _ => return None }
      if (ts.name == "ts_us" && div == dl * 1000000L) Some((ts, dl)) else None
    case _ => None
  }

  private def aggFn(e: Expression): Option[(String, Expression)] = e match {
    case AggregateExpression(Min(c), _, false, None, _) => Some(("min", c))
    case AggregateExpression(Max(c), _, false, None, _) => Some(("max", c))
    case AggregateExpression(Sum(c, _), _, false, None, _) => Some(("sum", c))
    case AggregateExpression(Count(Seq(Literal(1, _))), _, false, None, _) =>
      Some(("count", e))
    case _ => None
  }

  private def tryRewrite(agg: Aggregate): Option[LogicalPlan] = {
    // child: Project injecting the grouping expression over the raw scan
    val (projectList, scan) = agg.child match {
      case Project(pl, lr: LogicalRelation) => (pl, lr)
      case _ => return None
    }
    val rawPath = relationRawPath(scan).getOrElse(return None)
    val storeRoot = RollupCatalog.storeForRawPath(rawPath).getOrElse(return None)

    // grouping: [dataset_id attr, bucket attr ← Project alias]
    val aliasByAttr = projectList.collect {
      case a @ Alias(child, _) => a.toAttribute.exprId -> child
    }.toMap
    val (dsAttr, bucketAttr) = agg.groupingExpressions match {
      case Seq(ds: AttributeReference, g: AttributeReference)
          if ds.name == "dataset_id" => (ds, g)
      case _ => return None
    }
    val duration = aliasByAttr.get(bucketAttr.exprId)
      .flatMap(bucketDuration).map(_._2).getOrElse(return None)
    val level = Fidelity.aggLevels.find(_.seconds == duration).getOrElse(return None)

    // output: [dataset_id, Alias(bucket), Alias(min(value)), Alias(max),
    //          Alias(sum), Alias(count(1))] in any order after the keys
    val outputs: Seq[(NamedExpression, String)] =
      agg.aggregateExpressions.map {
        case a: AttributeReference if a.exprId == dsAttr.exprId => (a, "dataset_id")
        case al @ Alias(ar: AttributeReference, _) if ar.exprId == bucketAttr.exprId =>
          (al, "bucket_s")
        case al @ Alias(fn, _) =>
          aggFn(fn) match {
            case Some(("count", _)) => (al, "cnt")
            case Some((k, v: AttributeReference)) if v.name == "value" =>
              (al, Map("min" -> "min_v", "max" -> "max_v", "sum" -> "sum_v")(k))
            case _ => return None
          }
        case _ => return None
      }
    // require the full monoid so the rewrite can serve every column
    val needed = outputs.map(_._2).toSet
    if (!Set("dataset_id", "bucket_s").subsetOf(needed)) return None

    val rollup = Tables.readRollup(spark, storeRoot, level)
      .queryExecution.analyzed
    val byName = rollup.output.map(a => a.name -> a).toMap

    val newProject = outputs.map { case (orig, src) =>
      val col = byName.getOrElse(src, return None)
      val expr: Expression =
        if (orig.nullable) col
        else Coalesce(Seq(col, Literal.default(col.dataType)))
      Alias(expr, orig.name)(exprId = orig.exprId)
    }
    logInfo(s"rewriting ${duration}s window aggregate over $rawPath to " +
      s"rollup level ${level.name} of $storeRoot")
    Some(Project(newProject, rollup))
  }
}
