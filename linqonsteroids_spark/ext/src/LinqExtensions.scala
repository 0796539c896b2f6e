// Catalyst-layer index substitution — the JVM twin of the Python-side
// MV/index rewrite in plans/registry.py (SURVEY §4.3's documented
// stretch: "PySpark cannot inject Catalyst rules without shipping a
// JAR; a spark.sql.extensions JAR is a stretch goal").
//
// Reference parity: the reference's optimizer substitutes a
// filter-by-key over a collection with a lookup into a registered
// index (HashJoinExperiments.scala:8-37 `filterToGroupBy`, and the
// paper's §5 index-aware rewriting). Here the same recognition runs
// INSIDE Catalyst: `Filter(col = lit, Scan(base_table))` is rewritten
// to `Filter(col = lit, Scan(index_table))` where the registered index
// table holds the same rows partitioned BY that column — after the
// rewrite, Catalyst's own PushDownPredicates + PruneFileSourcePartitions
// turn the equality predicate into directory-level partition pruning,
// so the scan touches exactly one partition instead of the full base
// table. At 100 TB that is the difference between a full-table scan
// and a single-directory read, applied transparently to ANY query over
// the base path — SQL or DataFrame — with zero Python-side involvement.
//
// Registry format (runtime-settable, no restart):
//   spark.linqonsteroids.indexes = basePath,column,indexPath[;...]
//
// The substituted relation is projected back onto the ORIGINAL output
// attribute ids (Alias with the old exprId, plus a Cast to the old
// type in case partition-column type inference widened/narrowed), so
// every reference above the rewritten scan stays resolved and
// type-correct; Catalyst's UnwrapCastInBinaryComparison then removes
// the cast from the pushed-down comparison so pruning still fires.

package linqonsteroids.ext

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

class LinqExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(session => IndexSubstitution(session))
  }
}

case class IndexSubstitution(session: SparkSession) extends Rule[LogicalPlan] {

  private def registry: Seq[(String, String, String)] =
    session.conf
      .getOption("spark.linqonsteroids.indexes")
      .map(
        _.split(";").toSeq
          .map(_.trim)
          .filter(_.nonEmpty)
          .flatMap { e =>
            e.split(",").map(_.trim) match {
              case Array(base, col, idx) => Some((base, col, idx))
              case _                     => None
            }
          }
      )
      .getOrElse(Seq.empty)

  private def rootPath(rel: LogicalRelation): Option[String] =
    rel.relation match {
      case fs: HadoopFsRelation => fs.location.rootPaths.headOption.map(_.toString)
      case _                    => None
    }

  private def pathMatches(actual: String, registered: String): Boolean = {
    val norm = actual.stripPrefix("file:").stripSuffix("/")
    norm == registered.stripSuffix("/") ||
    actual == registered.stripSuffix("/")
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other     => Seq(other)
  }

  // equality and IN-list both become directory-level partition pruning
  // after substitution, so both justify routing to the index table
  private def hasPrunablePredOn(cond: Expression, col: String): Boolean =
    splitConjuncts(cond).exists {
      case EqualTo(a: AttributeReference, _: Literal) => a.name == col
      case EqualTo(_: Literal, a: AttributeReference) => a.name == col
      case In(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) =>
        a.name == col
      case InSet(a: AttributeReference, _) => a.name == col
      case _                               => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val reg = registry
    if (reg.isEmpty) return plan
    plan transform {
      case f @ Filter(cond, rel: LogicalRelation) =>
        val path = rootPath(rel)
        reg.find { case (base, col, _) =>
          path.exists(p => pathMatches(p, base)) && hasPrunablePredOn(cond, col)
        } match {
          case Some((_, _, idxPath)) =>
            val idx = session.read.parquet(idxPath).queryExecution.analyzed
            val byName = idx.output.map(a => a.name -> a).toMap
            if (rel.output.forall(o => byName.contains(o.name))) {
              val proj = rel.output.map { o =>
                Alias(Cast(byName(o.name), o.dataType), o.name)(exprId = o.exprId)
              }
              Filter(cond, Project(proj, idx))
            } else f
          case None => f
        }
    }
  }
}
