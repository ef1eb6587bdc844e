package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Folds open-schema round-trips at the optimizer level.
  *
  * [[graft.ops.OpenSchema.allAttributes]] builds
  * `map_filter(map('c1', c1, 'c2', c2, …), (k, v) => v.isNotNull)` and a
  * later projection reads values back with `props['k']`. Catalyst's
  * built-ins cannot remove the per-row map build: `SimplifyExtractValueOps`
  * does not see through `MapFilter`, and `CollapseProject` refuses to merge
  * the two projections when `props` is consumed more than once (it would
  * duplicate the map construction). So every row builds and filters the
  * whole map only to extract a couple of values.
  *
  * This rule matches Project(outer, Project(inner, child)) where an inner
  * alias is the open-schema map (all keys foldable literals, pairwise
  * distinct) and EVERY outer use of it is a literal-key `GetMapValue`. Each
  * extraction folds to `If(pred[k→key, v→value], value, null)` over the
  * map entry's value expression (absent keys fold to null — `map_filter`
  * can only drop entries); the map alias is then removed from the inner
  * projection and the folded value's source columns are passed through.
  * Spark's own constant folding simplifies the common `isNotNull` predicate
  * further. Net: the round-trip costs exactly a column reference per row.
  */
object SimplifyOpenSchemaProjection extends Rule[LogicalPlan] {

  private type Entry = (Literal, Expression)

  /** (key literal → value expr) pairs when ALL keys are foldable literals,
    * pairwise distinct, and every value expression is deterministic — the
    * shape OpenSchema emits. The fold below duplicates a value expression
    * into both the bound predicate and the If result; a non-deterministic
    * value (e.g. rand()) would evaluate twice with different results,
    * diverging from map_filter's build-the-map-once-per-row semantics, so
    * such maps are left alone (Catalyst convention for expression-
    * duplicating rules).
    */
  private def literalEntries(entries: Seq[Expression]): Option[Seq[Entry]] = {
    if (entries.length % 2 != 0) return None
    val kv = entries.grouped(2).map { case Seq(k, v) => (k, v) }.toSeq
    val lits = kv.collect { case (k: Literal, v) => (k, v) }
    if (lits.length != kv.length) return None
    if (lits.map(_._1.value).distinct.length != lits.length) return None
    if (!lits.forall(_._2.deterministic)) return None
    Some(lits)
  }

  private final case class MapDef(entries: Seq[Entry], pred: Expression,
                                  kVar: NamedLambdaVariable,
                                  vVar: NamedLambdaVariable)

  private def mapDefOf(e: Expression): Option[MapDef] = e match {
    case MapFilter(CreateMap(entries, _),
        LambdaFunction(pred, Seq(k: NamedLambdaVariable,
          v: NamedLambdaVariable), _)) if pred.deterministic =>
      literalEntries(entries).map(MapDef(_, pred, k, v))
    case _ => None
  }

  /** `map_filter` keeps an entry only when the predicate is TRUE (null
    * counts as dropped); an absent key looks up to null.
    */
  private def fold(d: MapDef, key: Literal, resultType:
      org.apache.spark.sql.types.DataType): Expression =
    d.entries.find(_._1.semanticEquals(key)) match {
      case Some((_, value)) =>
        val bound = d.pred.transform {
          case v: NamedLambdaVariable if v.exprId == d.kVar.exprId => key
          case v: NamedLambdaVariable if v.exprId == d.vVar.exprId => value
        }
        If(Coalesce(Seq(bound, Literal(false))), value,
          Literal(null, resultType))
      case None => Literal(null, resultType)
    }

  /** True when `e` references a map attr anywhere EXCEPT directly under a
    * literal-key GetMapValue (then the fold can't eliminate the map).
    */
  private def blockedUse(e: Expression, mapIds: Set[ExprId]): Boolean =
    e match {
      case GetMapValue(ar: AttributeReference, _: Literal)
          if mapIds.contains(ar.exprId) => false
      case ar: AttributeReference if mapIds.contains(ar.exprId) => true
      case other => other.children.exists(blockedUse(_, mapIds))
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // Inline shape: the whole round-trip inside one expression tree.
    case p: LogicalPlan if p.expressions.exists(_.exists {
        case GetMapValue(mf: MapFilter, _: Literal) => mapDefOf(mf).isDefined
        case _ => false
      }) =>
      p.transformExpressions {
        case g @ GetMapValue(mf: MapFilter, key: Literal)
            if mapDefOf(mf).isDefined =>
          fold(mapDefOf(mf).get, key, g.dataType)
      }

    // Two-projection shape (what allAttributes + select produces).
    case p @ Project(outer, proj @ Project(inner, child)) =>
      val mapDefs: Map[ExprId, MapDef] = inner.collect {
        case a: Alias if mapDefOf(a.child).isDefined =>
          a.exprId -> mapDefOf(a.child).get
      }.toMap
      if (mapDefs.isEmpty || outer.exists(blockedUse(_, mapDefs.keySet))) p
      else {
        var fired = false
        val newOuter = outer.map(_.transformUp {
          case g @ GetMapValue(ar: AttributeReference, key: Literal)
              if mapDefs.contains(ar.exprId) =>
            fired = true
            fold(mapDefs(ar.exprId), key, g.dataType)
        }.asInstanceOf[NamedExpression])
        if (!fired) p
        else {
          // Drop now-unused map aliases; pass folded values' source columns
          // through the inner projection.
          val stillReferenced = newOuter.flatMap(_.references).map(_.exprId).toSet
          val kept = inner.filterNot(a =>
            mapDefs.contains(a.exprId) && !stillReferenced.contains(a.exprId))
          val provided = kept.map(_.exprId).toSet
          val needed = newOuter.flatMap(_.references)
            .filterNot(ar => provided.contains(ar.exprId))
            .distinct
          Project(newOuter, Project(kept ++ needed, child))
        }
      }
  }
}
