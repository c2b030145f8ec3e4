package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact heavy hitters over an arbitrarily-high-cardinality column via
  * the classic two-pass sketch-then-recount algorithm:
  *
  *   pass 1 — a single scan folds every partition into a k-counter
  *            Misra-Gries summary ([[graft.functions.MisraGriesAgg]]);
  *            the merged sketch holds <= k candidate items and is
  *            guaranteed to contain every item with true frequency
  *            > N/(k+1);
  *   pass 2 — a second scan counts ONLY the candidates exactly
  *            (broadcast semi-join on <= k items, then a hash-agg whose
  *            key space is <= k), and the > phi*N threshold filter runs
  *            on exact counts.
  *
  * Output is therefore EXACT — precisely the items with frequency
  * strictly greater than `phi * N`, with their true counts — while no
  * stage ever holds more than O(k) state per task or shuffles more
  * than O(k * partitions) rows.
  *
  * Why not a plain `GROUP BY item HAVING count > phi*N`? At 100 TB the
  * group-by shuffles every distinct item (token vocabularies run to
  * billions of keys) just to keep the few hundred frequent ones. Here
  * the full-cardinality column never crosses the wire: the shuffle
  * traffic is one O(k) sketch per map task in pass 1 and <= k
  * candidate groups in pass 2.
  *
  * Requires `phi >= 1/(k+1)`, otherwise the sketch cannot guarantee
  * candidates at the threshold (enforced). A no-miss sketch needs
  * k+1 >= 1/phi counters.
  */
object HeavyHitters {

  /** All items of `item` (cast to string, NULLs dropped) with exact
    * frequency > `phi * N`, as `(item, cnt)`. */
  def heavyHitters(df: DataFrame, item: Column, k: Int,
      phi: Double): DataFrame = {
    require(phi > 0.0 && phi < 1.0, s"phi must be in (0,1), got $phi")
    require(phi * (k + 1) >= 1.0,
      s"no-miss guarantee needs k+1 >= 1/phi: k=$k, phi=$phi")
    val items = df.select(item.cast("string").as("item"))
      .filter(col("item").isNotNull)
    // pass 1: one scan -> merged sketch row carrying the exact total N
    // alongside the candidates (same aggregate, no extra pass)
    val sketch = items.agg(
      count(lit(1)).as("n"),
      graft.functions.GraftFunctions.misraGries(col("item"), k).as("mg"))
    val cand = sketch
      .select(col("n"), explode(col("mg")).as("e"))
      .select(col("e.item").as("item"), col("n"))
    // pass 2: exact recount of candidates only. The broadcast side is
    // <= k rows; the agg keys are those same <= k items, so the final
    // exchange carries at most k * shuffle-partitions partial rows.
    items.join(broadcast(cand), Seq("item"))
      .groupBy(col("item"), col("n"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > col("n") * phi)
      .select(col("item"), col("cnt"))
  }

  /** Per-group exact heavy hitters: for every distinct value of
    * `group`, the items with frequency > `phi * N_group` (N_group =
    * that group's item count) and their exact counts, as
    * `(group, item, cnt)`. The per-language boilerplate/stopword
    * detector: one k-counter sketch per group (state O(groups * k) —
    * groups are language/source codes, small by construction; the
    * ITEM cardinality, which is what explodes at corpus scale, still
    * never crosses the wire un-sketched), then one exact recount of
    * the <= groups * k candidates via a broadcast join keyed on
    * (group, item). Same no-miss bound per group: requires
    * `phi >= 1/(k+1)`. */
  def heavyHittersByGroup(df: DataFrame, group: Column, item: Column,
      k: Int, phi: Double): DataFrame = {
    require(phi > 0.0 && phi < 1.0, s"phi must be in (0,1), got $phi")
    require(phi * (k + 1) >= 1.0,
      s"no-miss guarantee needs k+1 >= 1/phi: k=$k, phi=$phi")
    val items = df.select(group.cast("string").as("grp"),
        item.cast("string").as("item"))
      .filter(col("item").isNotNull && col("grp").isNotNull)
    val sketch = items.groupBy(col("grp")).agg(
      count(lit(1)).as("n"),
      graft.functions.GraftFunctions.misraGries(col("item"), k).as("mg"))
    val cand = sketch
      .select(col("grp"), col("n"), explode(col("mg")).as("e"))
      .select(col("grp"), col("e.item").as("item"), col("n"))
    items.join(broadcast(cand), Seq("grp", "item"))
      .groupBy(col("grp"), col("item"), col("n"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > col("n") * phi)
      .select(col("grp"), col("item"), col("cnt"))
  }
}
