// Catalyst-layer index substitution — the JVM twin of the Python-side
// MV/index rewrite in plans/registry.py (SURVEY §4.3's documented
// stretch: "PySpark cannot inject Catalyst rules without shipping a
// JAR; a spark.sql.extensions JAR is a stretch goal").
//
// Reference parity: the reference's optimizer substitutes a
// filter-by-key over a collection with a lookup into a registered
// index (HashJoinExperiments.scala:8-37 `filterToGroupBy`, and the
// paper's §5 index-aware rewriting). Here the same recognition runs
// INSIDE Catalyst: `Filter(col = lit, Scan(base_table))` — and the
// column-pruned shape `Filter(col = lit, Project(cols, Scan(base)))`
// — is rewritten to scan the registered index table instead, which
// holds the same rows partitioned BY that column; Catalyst's own
// PushDownPredicates + PruneFileSourcePartitions then turn the
// equality predicate into directory-level partition pruning, so the
// scan touches exactly one partition instead of the full base table.
// At 100 TB that is the difference between a full-table scan and a
// single-directory read, applied transparently to ANY query over the
// base path — SQL or DataFrame — with zero Python-side involvement.
//
// Registry formats (runtime-settable, no restart):
//   spark.linqonsteroids.indexes     = basePath,column,indexPath[;...]
//   spark.linqonsteroids.joinindexes = leftPath,leftKey,rightPath,
//                                      rightKey,mvPath[;...]
//   spark.linqonsteroids.aggindexes  = basePath,keyCol,aggMvPath[;...]
//
// The agg registry is the transparent-ROLLUP substitution: a whole
// Aggregate node grouping the registered base scan by exactly the
// registered key — aggregates limited to count(*) / sum / min / max of
// plain columns, non-distinct, unfiltered — is replaced by ONE scan of
// the pre-aggregated MV (naming convention: cnt_star, sum_<col>,
// min_<col>, max_<col>; the Python repository writes exactly these).
// Filters BELOW the aggregate are allowed only on the group key itself
// (they commute with the grouping) and are re-applied above the MV
// scan. The physical win is categorical: the plan has NO aggregation
// operator at all — a grouped rollup over 100 TB becomes a read of
// n_groups rows. Anything outside the recognized shape (avg, distinct,
// expressions over aggregates, filters on non-key columns, multi-key
// grouping) leaves the plan untouched.
//
// The join registry is the JVM twin of the Python join-MV rewrite
// (plans/registry.py lookup_join): an INNER equi-join of the two
// registered base scans on the registered key pair — the whole join —
// is replaced by ONE scan of the pre-joined MV (projected back onto
// both sides' original exprIds), eliminating the join AND both base
// scans; residual filters/projections above the join survive
// unchanged. v1 scope, enforced conservatively: bare (or
// pass-through-projected) parquet scans on both sides, a single
// EqualTo join condition on exactly the registered pair (either
// orientation). Anything else is left untouched.
//
// Robustness contract (round-8 hardening):
//  - the index relation is loaded AT MOST ONCE per path per JVM
//    (IndexSubstitution.relationCache); without the cache every
//    fixpoint iteration of the optimizer re-ran file listing/analysis
//    on every matching Filter. Each use stamps FRESH exprIds via
//    newInstance() so two substitutions in one query (self-join)
//    cannot alias each other's attributes.
//  - a stale registry entry (deleted/moved index directory, corrupt
//    footer) must NEVER break the query: the load is wrapped in
//    try/catch and any failure falls back to the original plan (the
//    base scan), recording nothing. Deleting the directory AFTER a
//    successful load behaves like any Spark table deleted mid-session
//    (execution-time error; re-register or clear the conf).
//
// The substituted relation is projected back onto the ORIGINAL output
// attribute ids (Alias with the old exprId, plus a Cast to the old
// type in case partition-column type inference widened/narrowed), so
// every reference above the rewritten scan stays resolved and
// type-correct; Catalyst's UnwrapCastInBinaryComparison then removes
// the cast from the pushed-down comparison so pruning still fires.

package linqonsteroids.ext

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

class LinqExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(session => IndexSubstitution(session))
  }
}

object IndexSubstitution {
  // analyzed index relations, one load per path per JVM; the smoke
  // (tools/catalyst_ext_smoke.py) asserts loadCount == |distinct paths|
  // after repeated queries, pinning the no-relist property.
  //
  // Invalidation: the cache holds the index's FILE LISTING for the JVM
  // lifetime, so an index/MV directory rewritten in-session would
  // silently serve the stale listing. The Python repository bumps
  // spark.linqonsteroids.cacheEpoch whenever it (re)materializes an
  // entry; a changed epoch clears the cache before the next rewrite
  // (round-8 ADVICE). clearCache() is the direct hook for callers that
  // rewrite index data without going through the repository.
  private[ext] val relationCache = TrieMap.empty[String, LogicalPlan]
  @volatile private[ext] var loadCount: Int = 0
  @volatile private[ext] var epochSeen: String = "0"

  def clearCache(): Unit = relationCache.clear()

  private[ext] def syncEpoch(epoch: String): Unit =
    if (epoch != epochSeen) synchronized {
      if (epoch != epochSeen) {
        relationCache.clear()
        epochSeen = epoch
      }
    }
}

case class IndexSubstitution(session: SparkSession) extends Rule[LogicalPlan] {

  /** Conf entries of ``arity`` fields, or ``arity + 1`` when the Python
    * repository runs under refresh_mode='on_read_stale' and appends the
    * base's jvm_snapshot digest (the r12 staleness veto — see
    * [[digestOk]]). */
  private def entries(conf: String, arity: Int): Seq[Array[String]] =
    session.conf
      .getOption(conf)
      .map(
        _.split(";").toSeq
          .map(_.trim)
          .filter(_.nonEmpty)
          .map(_.split(",").map(_.trim))
          .filter(a => a.length == arity || a.length == arity + 1)
      )
      .getOrElse(Seq.empty)

  private def digestOf(a: Array[String], arity: Int): Option[String] =
    if (a.length > arity) Some(a(arity)) else None

  private def registry: Seq[(String, String, String, Option[String])] =
    entries("spark.linqonsteroids.indexes", 3).map(a =>
      (a(0), a(1), a(2), digestOf(a, 3))
    )

  /** (leftPath, leftKey, rightPath, rightKey, mvPath, digest) */
  private def joinRegistry
      : Seq[(String, String, String, String, String, Option[String])] =
    entries("spark.linqonsteroids.joinindexes", 5).map(a =>
      (a(0), a(1), a(2), a(3), a(4), digestOf(a, 5))
    )

  /** (basePath, keyCol, aggMvPath, digest) */
  private def aggRegistry: Seq[(String, String, String, Option[String])] =
    entries("spark.linqonsteroids.aggindexes", 3).map(a =>
      (a(0), a(1), a(2), digestOf(a, 3))
    )

  // --- staleness veto (r12) -------------------------------------------------
  // In 'on_read_stale' mode the Python repository appends each MV's
  // base jvm_snapshot (sha256 over the sorted scheme-free
  // "absPath:size" listing of the base's data files, recorded at
  // materialization — plans/registry.py jvm_snapshot) to its conf
  // entry. Before substituting, the rule recomputes the digest from a
  // LIVE Hadoop listing of the registered base path(s) and vetoes the
  // rewrite on mismatch: a base append/overwrite/compaction after the
  // last refresh makes the MV unprovably fresh, and the query falls
  // back to the base scan — the JVM twin of the Python tier's
  // _stale_for. Cost: listing-only (no data read), and only on the
  // veto-eligible path (an entry with a digest that matched a query
  // shape); manual-mode entries carry no digest and skip the listing
  // entirely. No caching by design — the entire point is seeing an
  // append that happened a millisecond ago; a failed listing counts as
  // mismatch (never substitute what can't be proven fresh).

  /** Sorted "absPath:size" digest of the data files under ``paths``
    * (hidden dirs/files below each base excluded, like Spark's own
    * listing). None when any listing fails. */
  private def currentDigest(paths: Seq[String]): Option[String] =
    try {
      val hconf = session.sessionState.newHadoopConf()
      val lines = paths.flatMap { p =>
        val root = new org.apache.hadoop.fs.Path(p)
        val fs = root.getFileSystem(hconf)
        val basePath = fs.makeQualified(root).toUri.getPath
        val it = fs.listFiles(root, true)
        val buf = scala.collection.mutable.ArrayBuffer.empty[String]
        while (it.hasNext) {
          val st = it.next()
          val abs = st.getPath.toUri.getPath
          val rel = abs.stripPrefix(basePath).stripPrefix("/")
          val hidden =
            rel.split("/").exists(s => s.startsWith(".") || s.startsWith("_"))
          if (st.isFile && !hidden) buf += s"$abs:${st.getLen}"
        }
        buf
      }
      val md = java.security.MessageDigest.getInstance("SHA-256")
      md.update(lines.sorted.mkString("\n").getBytes("UTF-8"))
      Some(md.digest().map("%02x".format(_)).mkString)
    } catch {
      case scala.util.control.NonFatal(_) => None
    }

  /** True when the entry may substitute: no digest registered (manual
    * mode), or the live listing still matches the recorded one. */
  private def digestOk(expected: Option[String], paths: Seq[String]): Boolean =
    expected match {
      case None    => true
      case Some(d) => currentDigest(paths).contains(d)
    }

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
      // RANGE predicates prune too: the index layout is directory-
      // partitioned by the key, so once the scan is substituted the
      // re-applied filter becomes PartitionFilters and skips whole
      // directories (BETWEEN = two of these conjuncts). The registry
      // opt-in remains the cost guard — a barely-selective range on an
      // indexed key scans most directories, same as a huge IN-list.
      case GreaterThan(a: AttributeReference, _: Literal)        => a.name == col
      case GreaterThan(_: Literal, a: AttributeReference)        => a.name == col
      case GreaterThanOrEqual(a: AttributeReference, _: Literal) => a.name == col
      case GreaterThanOrEqual(_: Literal, a: AttributeReference) => a.name == col
      case LessThan(a: AttributeReference, _: Literal)           => a.name == col
      case LessThan(_: Literal, a: AttributeReference)           => a.name == col
      case LessThanOrEqual(a: AttributeReference, _: Literal)    => a.name == col
      case LessThanOrEqual(_: Literal, a: AttributeReference)    => a.name == col
      case _                                                     => false
    }

  /** Analyzed index relation with FRESH exprIds, or None on any load
    * failure (stale path, corrupt files) — never throw from the rule. */
  private def loadIndex(idxPath: String): Option[LogicalPlan] =
    try {
      val cached = IndexSubstitution.relationCache.getOrElseUpdate(
        idxPath, {
          val analyzed = session.read.parquet(idxPath).queryExecution.analyzed
          IndexSubstitution.loadCount += 1 // successful loads only
          analyzed
        }
      )
      Some(cached match {
        case m: org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation =>
          m.newInstance().asInstanceOf[LogicalPlan]
        case other => other
      })
    } catch {
      case scala.util.control.NonFatal(_) => None
    }

  /** The substituted child for a matched (cond, base relation): the
    * index scan aliased back onto the base relation's exprIds/types. */
  private def substituted(
      cond: Expression,
      rel: LogicalRelation
  ): Option[LogicalPlan] = {
    val path = rootPath(rel)
    registry
      .find { case (base, col, _, _) =>
        path.exists(p => pathMatches(p, base)) && hasPrunablePredOn(cond, col)
      }
      .filter { case (base, _, _, digest) => digestOk(digest, Seq(base)) }
      .flatMap { case (_, _, idxPath, _) => loadIndex(idxPath) }
      .flatMap { idx =>
        val byName = idx.output.map(a => a.name -> a).toMap
        if (rel.output.forall(o => byName.contains(o.name))) {
          val proj = rel.output.map { o =>
            Alias(Cast(byName(o.name), o.dataType), o.name)(exprId = o.exprId)
          }
          Some(Project(proj, idx))
        } else None
      }
  }

  /** Base relation under a chain of pass-through Projects and Filters
    * (the optimizer pushes user predicates AND inferred isnotnulls
    * below the join before this rule fires), plus the stripped filter
    * conditions — they are RE-APPLIED above the substituted MV, so
    * nothing is lost. Pass-through Projects can be dropped outright:
    * the substitution re-projects every base column by original exprId
    * and the Join's own output prunes at the end. */
  private def stripToScan(
      p: LogicalPlan
  ): Option[(LogicalRelation, Seq[Expression])] = p match {
    case rel: LogicalRelation => Some((rel, Nil))
    case Project(projList, child)
        if projList.forall(_.isInstanceOf[AttributeReference]) =>
      stripToScan(child)
    // only DETERMINISTIC filters may be relocated: a stripped filter is
    // re-applied ABOVE the substituted MV — above a join it runs once
    // per joined row instead of once per base row, and above an
    // aggregate once per group instead of once per row. rand() < 0.5
    // has no column references, so reference-based guards alone admit
    // it; nondeterminism must veto the strip itself.
    case Filter(c, child) if c.deterministic =>
      stripToScan(child).map { case (r, cs) => (r, c +: cs) }
    case _ => None
  }

  /** MV scan replacing a registered inner equi-join, aliased onto the
    * join's original exprIds with residual side-filters re-applied —
    * or None if anything doesn't match. */
  private def substitutedJoin(j: Join): Option[LogicalPlan] = {
    if (j.joinType != Inner) return None
    val (a, b) = j.condition match {
      case Some(EqualTo(x: AttributeReference, y: AttributeReference)) =>
        (x, y)
      case _ => return None
    }
    val (lAttr, rAttr) =
      if (j.left.outputSet.contains(a) && j.right.outputSet.contains(b))
        (a, b)
      else if (j.left.outputSet.contains(b) && j.right.outputSet.contains(a))
        (b, a)
      else return None
    for {
      ls <- stripToScan(j.left)
      rs <- stripToScan(j.right)
      lp <- rootPath(ls._1)
      rp <- rootPath(rs._1)
      hit <- joinRegistry.find { case (lPath, lKey, rPath, rKey, _, _) =>
        (pathMatches(lp, lPath) && pathMatches(rp, rPath) &&
          lAttr.name == lKey && rAttr.name == rKey) ||
        (pathMatches(lp, rPath) && pathMatches(rp, lPath) &&
          lAttr.name == rKey && rAttr.name == lKey)
      }
      // the join MV's recorded digest spans BOTH base listings (the
      // Python side digests the joined frame's input files)
      if digestOk(hit._6, Seq(hit._1, hit._3))
      mv <- loadIndex(hit._5)
      byName = mv.output.map(o => o.name -> o).toMap
      wanted = (ls._1.output ++ rs._1.output)
      // name-based restoration is only sound when names are unique
      // across BOTH sides — a shared column name would silently bind
      // both sides to the same MV column (the Python repository
      // enforces uniqueness at MV registration; a hand-written conf
      // must not bypass that)
      if wanted.map(_.name).distinct.size == wanted.size
      if wanted.forall(o => byName.contains(o.name))
    } yield {
      // every base column restored under its ORIGINAL exprId...
      val restored: LogicalPlan = Project(
        wanted.map { o =>
          Alias(Cast(byName(o.name), o.dataType), o.name)(exprId = o.exprId)
        },
        mv
      )
      // ...then the stripped side-filters verbatim (their attrs resolve
      // against the restored ids), then the Join's own output pruning
      val conds = ls._2 ++ rs._2
      val filtered =
        if (conds.isEmpty) restored
        else Filter(conds.reduce(And), restored)
      Project(j.output.map(o => o: NamedExpression), filtered)
    }
  }

  /** MV column the naming convention assigns to a recognized aggregate
    * function — None for anything the rollup cannot answer. count(*)
    * reaches here as Count(Literal(1)) (foldable child); count(col) has
    * a non-foldable child and correctly falls through (its null
    * semantics differ from cnt_star). A foldable child that evaluates
    * to NULL (count(NULL), count(cast(null as int))) is 0 per group,
    * not count(*), so it must also fall through. */
  private def aggMvColumn(fn: AggregateFunction): Option[String] = fn match {
    case c: Count
        if c.children.sizeIs == 1 && c.children.head.foldable &&
          c.children.head.eval() != null =>
      Some("cnt_star")
    case s: Sum =>
      s.children match {
        case Seq(a: AttributeReference) => Some(s"sum_${a.name}")
        case _                          => None
      }
    case m: Min =>
      m.children match {
        case Seq(a: AttributeReference) => Some(s"min_${a.name}")
        case _                          => None
      }
    case m: Max =>
      m.children match {
        case Seq(a: AttributeReference) => Some(s"max_${a.name}")
        case _                          => None
      }
    case _ => None
  }

  /** MV scan replacing a registered single-key rollup — or None if the
    * Aggregate isn't exactly the shape the MV answers. */
  private def substitutedAgg(a: Aggregate): Option[LogicalPlan] = {
    val g = a.groupingExpressions match {
      case Seq(attr: AttributeReference) => attr
      case _                             => return None
    }
    for {
      stripped <- stripToScan(a.child)
      (rel, conds) = stripped
      // filters below the aggregate commute with the grouping ONLY when
      // they touch nothing but the group key (by exprId, not name — a
      // same-named column from elsewhere must not slip through)
      if conds.forall(_.references.forall(_.exprId == g.exprId))
      p <- rootPath(rel)
      hit <- aggRegistry.find { case (base, key, _, _) =>
        pathMatches(p, base) && g.name == key
      }
      if digestOk(hit._4, Seq(hit._1))
      mv <- loadIndex(hit._3)
      byName = mv.output.map(o => o.name -> o).toMap
      if byName.contains(g.name)
      proj <- {
        val maybe: Seq[Option[NamedExpression]] = a.aggregateExpressions.map {
          case attr: AttributeReference if attr.semanticEquals(g) =>
            Some(
              Alias(Cast(byName(g.name), attr.dataType), attr.name)(
                exprId = attr.exprId
              )
            )
          case al @ Alias(ae: AggregateExpression, nm)
              if !ae.isDistinct && ae.filter.isEmpty =>
            aggMvColumn(ae.aggregateFunction)
              .flatMap(byName.get)
              .map(c => Alias(Cast(c, ae.dataType), nm)(exprId = al.exprId))
          case _ => None // expressions over aggregates, etc.: bail
        }
        if (maybe.forall(_.isDefined)) Some(maybe.map(_.get)) else None
      }
    } yield {
      // group-key filters re-applied over the MV scan, rebound to the
      // MV's key attribute (cast to the base key type in case types
      // differ). Matching by exprId terminates: the replacement's child
      // attribute carries the MV's exprId, so transformDown cannot
      // re-wrap it (matching by NAME looped — the MV key shares the
      // name — and stack-overflowed the optimizer).
      val fixed = conds.map(_.transform {
        case ar: AttributeReference if ar.exprId == g.exprId =>
          Cast(byName(g.name), ar.dataType)
      })
      val filtered =
        if (fixed.isEmpty) mv else Filter(fixed.reduce(And), mv)
      Project(proj, filtered)
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val haveFilters = registry.nonEmpty
    val haveJoins = joinRegistry.nonEmpty
    val haveAggs = aggRegistry.nonEmpty
    if (!haveFilters && !haveJoins && !haveAggs) return plan
    IndexSubstitution.syncEpoch(
      session.conf
        .getOption("spark.linqonsteroids.cacheEpoch")
        .getOrElse("0")
    )
    plan transform {
      case f @ Filter(cond, rel: LogicalRelation) if haveFilters =>
        substituted(cond, rel).map(Filter(cond, _)).getOrElse(f)
      // column-pruned shape: a pass-through Project between the Filter
      // and the scan (rule-ordering dependent; previously missed). The
      // alias projection reproduces the base exprIds, so the original
      // Project stays resolved and collapses onto it.
      case f @ Filter(cond, Project(projList, rel: LogicalRelation))
          if haveFilters &&
            projList.forall(_.isInstanceOf[AttributeReference]) =>
        substituted(cond, rel)
          .map(sub => Filter(cond, Project(projList, sub)))
          .getOrElse(f)
      case j: Join if haveJoins =>
        substitutedJoin(j).getOrElse(j)
      case a: Aggregate if haveAggs =>
        substitutedAgg(a).getOrElse(a)
    }
  }
}
