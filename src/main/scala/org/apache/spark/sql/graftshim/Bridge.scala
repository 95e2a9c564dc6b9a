package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to the `private[sql]` Column ↔ Expression converters —
  * the supported pattern for libraries that ship native Catalyst
  * expressions without going through the session function registry.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** The un-analyzed structure behind a Column, re-expressed as a tiny
    * public ADT a metadata-level predicate planner can walk. Spark 4
    * Columns carry `private[sql]` ColumnNode trees (UnresolvedFunction /
    * UnresolvedAttribute / Literal) rather than catalyst expressions;
    * anything beyond those three shapes surfaces as [[POpaque]] so a
    * planner degrades to conservative keeps.
    */
  sealed trait PNode
  final case class PFunc(name: String, args: Seq[PNode]) extends PNode
  final case class PAttr(name: String) extends PNode
  final case class PLit(value: Any) extends PNode
  case object POpaque extends PNode

  def predicateTree(c: Column): PNode = toP(c.node)

  /** One parquet file's Spark schema read DRIVER-LOCALLY from its footer
    * (`spark.read.parquet(...)` spins a listing/inference Spark job, which
    * a metadata-only scan planner must never pay). Uses Spark's own
    * footer→StructType converter so type mapping is identical to a real
    * scan's.
    */
  def parquetSchema(spark: org.apache.spark.sql.SparkSession,
      file: String): org.apache.spark.sql.types.StructType = {
    val conf = spark.sessionState.newHadoopConf()
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(file), conf)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try new org.apache.spark.sql.execution.datasources.parquet
      .ParquetToSparkSchemaConverter(spark.sessionState.conf)
      .convert(r.getFooter.getFileMetaData.getSchema)
    finally r.close()
  }

  private def toP(n: org.apache.spark.sql.internal.ColumnNode): PNode =
    n match {
      case f: org.apache.spark.sql.internal.UnresolvedFunction =>
        PFunc(f.functionName, f.arguments.map(toP))
      case a: org.apache.spark.sql.internal.UnresolvedAttribute =>
        PAttr(a.nameParts.mkString("."))
      case l: org.apache.spark.sql.internal.Literal =>
        PLit(l.value)
      case _ => POpaque
    }
}
