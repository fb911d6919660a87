package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema evolution: align an old-schema snapshot with a new-schema batch,
  * null-filling columns the old data lacks and widening compatible types —
  * the semantics of the reference's `SchemaMigrationProcessor`
  * (/root/reference/src/main/scala/main.scala:114).
  *
  * The target schema is the union of both schemas; the new side's type wins
  * wherever both define a column (migration moves forward). Pure
  * projections + unionByName: no shuffle at all, so migration cost at
  * 100 TB is a metadata-only rewrite plan.
  */
object SchemaMigration {

  /** Align both frames to the union schema (new side's types win, missing
    * columns null-filled) WITHOUT combining rows — the building block the
    * streaming MERGE uses so an evolved batch can merge into an
    * old-schema target.
    */
  def alignPair(oldDf: DataFrame, newDf: DataFrame): (DataFrame, DataFrame) = {
    val newTypes = newDf.schema.map(f => f.name -> f.dataType).toMap
    val oldTypes = oldDf.schema.map(f => f.name -> f.dataType).toMap
    // union schema: old columns first (original order), then new-only columns
    val unionCols: Seq[(String, DataType)] =
      oldDf.schema.map(f => f.name -> newTypes.getOrElse(f.name, f.dataType)) ++
        newDf.schema.collect { case f if !oldTypes.contains(f.name) => f.name -> f.dataType }

    def align(df: DataFrame): DataFrame = {
      val have = df.schema.map(f => f.name -> f.dataType).toMap
      val cols: Seq[Column] = unionCols.map { case (name, dt) =>
        have.get(name) match {
          case Some(cur) if cur == dt => df.col(name)
          case Some(_)                => df.col(name).cast(dt).as(name)
          case None                   => lit(null).cast(dt).as(name)
        }
      }
      df.select(cols: _*)
    }
    (align(oldDf), align(newDf))
  }

  def migrate(oldDf: DataFrame, newDf: DataFrame): DataFrame = {
    val (o, n) = alignPair(oldDf, newDf)
    o.unionByName(n)
  }
}
