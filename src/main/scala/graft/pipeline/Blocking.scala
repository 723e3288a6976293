package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle-blocked all-pairs self-join: the distributed-exact plan for
  * inherently Θ(n²) pair enumeration.
  *
  * Rows hash into G groups; each unordered group pair (i,j) is one join
  * task and each row replicates to the G tasks containing its group. The
  * join is an equi-join on the task id — a hash shuffle with ~n·G rows,
  * evenly balanced, nothing broadcast — so it distributes across any
  * cluster size (vs a BroadcastNestedLoopJoin, which ships one whole side
  * to every executor and dies at scale). Compare volume stays Θ(n²): use
  * banding/LSH when a sub-quadratic candidate set is acceptable.
  */
private[pipeline] object Blocking {

  /** Self-join `df` (alias "a") with `df` (alias "b") over all unordered
    * pairs with `a.idCol < b.idCol`, each pair appearing exactly once:
    * pairs with groups i≠j meet in exactly one task (j<g → jG+g, j=g →
    * g(G+1), j>g → gG+j are distinct per row, and only task
    * (min,max) holds both groups); same-group pairs are restricted to the
    * diagonal task i(G+1), the only task id divisible by G+1.
    */
  def allPairs(df: DataFrame, idCol: String, groups: Int): DataFrame = {
    val G = groups
    val tasks = df
      .withColumn("__g", pmod(col(idCol), lit(G)).cast("int"))
      .withColumn("__task",
        explode(transform(sequence(lit(0), lit(G - 1)), j =>
          least(col("__g"), j) * G + greatest(col("__g"), j))))
    tasks.as("a").join(tasks.as("b"),
      col("a.__task") === col("b.__task") &&
        col(s"a.$idCol") < col(s"b.$idCol") &&
        (col("a.__g") =!= col("b.__g") || col("a.__task") % (G + 1) === 0))
  }
}
