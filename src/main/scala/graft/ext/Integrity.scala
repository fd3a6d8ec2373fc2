package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Referential-integrity auditing — the data-quality gate a pipeline
  * runs after ingest/join stages (a fact row whose dimension key
  * resolves nowhere silently vanishes from every inner join downstream;
  * better to count and alert than to discover it in a revenue report).
  */
object Integrity {

  /** One audit row per declared foreign key: child rows whose non-null
    * key has no parent (`n_orphans`), the distinct missing keys
    * (`n_orphan_keys`), and the child row count for rate context.
    *
    * Scale shape: per FK, ONE left-outer join on the key (shuffle or
    * broadcast as the optimizer sizes the parent's KEY PROJECTION — the
    * parent is pruned to its key column before the join, so even a wide
    * dimension broadcasts cheaply) feeding ONE aggregate that reads the
    * row total, the orphan count, and the distinct orphan keys off the
    * same pass (a null parent key marks the orphan) — the earlier form
    * paid a separate anti-join plus a second totals aggregate per FK for
    * the same numbers. Per-FK results union into the |specs|-row report.
    * Null child keys are EXCLUDED (SQL FK semantics: null references
    * nothing and violates nothing). */
  def fkAudit(specs: Seq[(String, DataFrame, String, DataFrame, String)]): DataFrame = {
    require(specs.nonEmpty, "fkAudit needs at least one FK spec")
    specs.map { case (name, child, childKey, parent, parentKey) =>
      val c = child.filter(col(childKey).isNotNull).select(col(childKey))
      // private alias: a self-referential FK (parent == child) would
      // otherwise make the join condition ambiguous; parents are unique
      // by key (the PK contract), so the left join never fans out
      val p = parent.select(col(parentKey).as("__fk_pk"))
      c.join(p, col(childKey) === col("__fk_pk"), "left")
        .agg(count(lit(1)).as("n_child_rows"),
          sum(when(col("__fk_pk").isNull, 1L).otherwise(0L)).as("n_orphans"),
          count_distinct(when(col("__fk_pk").isNull, col(childKey)))
            .as("n_orphan_keys"))
        .select(lit(name).as("fk"), col("n_child_rows"),
          col("n_orphans"), col("n_orphan_keys"))
    }.reduce(_ union _)
  }
}
