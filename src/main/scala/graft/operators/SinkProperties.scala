package graft.operators

import org.apache.spark.sql.DataFrame

/** Target-table properties, the reference's `targetTableProperties`
  * (/root/reference/stream-spec-yaml-example.yaml:44-47): storage format,
  * sort order, and parquet bloom-filter columns.
  *
  * Spark-native: `sortedBy` becomes `sortWithinPartitions` before the
  * write (clustered files → better min/max pruning on read, same effect
  * as Iceberg's sorted table order), and bloom filters use the parquet
  * writer's native `parquet.bloom.filter.enabled#<col>` options — point
  * lookups on the merge key skip row groups without scanning.
  */
object SinkProperties {

  final case class TableProperties(
      sortedBy: Seq[String] = Seq.empty,
      bloomFilterColumns: Seq[String] = Seq.empty,
      maxRowsPerFile: Option[Int] = None,
      /** Hive-style partition columns: selective reads prune whole
        * directories at planning time (`PartitionFilters` in the scan) —
        * at 100 TB the difference between touching one day and touching
        * the table. Iceberg's partition spec plays this role for the
        * reference's target.
        */
      partitionedBy: Seq[String] = Seq.empty
  )

  def write(df: DataFrame, dir: String, props: TableProperties): Unit = {
    val sorted = if (props.sortedBy.nonEmpty)
      df.sortWithinPartitions(props.sortedBy.head, props.sortedBy.tail: _*)
    else df
    val writer0 = sorted.write.mode("overwrite")
    val writer1 = props.bloomFilterColumns.foldLeft(writer0)((w, c) =>
      w.option(s"parquet.bloom.filter.enabled#$c", "true"))
    val writer2 = props.maxRowsPerFile.foldLeft(writer1)((w, n) =>
      w.option("maxRecordsPerFile", n.toLong))
    val writer3 = if (props.partitionedBy.nonEmpty)
      writer2.partitionBy(props.partitionedBy: _*)
    else writer2
    writer3.parquet(dir)
  }
}
