package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.HtmlTable

/** `parse_html_table` as a Catalyst Generator (UDTF): one input row holds a
  * full HTML page; the generator emits one output row per market-table body
  * row — (row_idx, headers, cells) — and zero rows for a page with no
  * parseable `table.alltable` (the reference's None,
  * reference scraper/table_scraper.py:4-43).
  *
  * This is the distributed twin of the driver-side `HtmlTable.ingest`: at
  * fleet scale, landed pages are read with
  * `spark.read.option("wholetext", true).text(dir)` and parsed where the
  * file splits land — the parse is embarrassingly parallel and never
  * touches the driver. Headers ride along per row so downstream can bind
  * cells positionally (`map_from_arrays`) without requiring every page to
  * share one schema.
  */
case class ParseHtmlTable(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("row_idx", IntegerType, nullable = false),
    StructField("headers", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("cells", ArrayType(StringType, containsNull = false), nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"parse_html_table needs a STRING page column, got ${child.dataType.sql}")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val html = child.eval(input)
    if (html == null) Nil
    else HtmlTable.parse(html.toString) match {
      case None => Nil
      case Some(HtmlTable.Parsed(headers, rows)) =>
        val hArr = new GenericArrayData(headers.map(UTF8String.fromString).toArray[Any])
        rows.zipWithIndex.map { case (cells, i) =>
          InternalRow(i,
            hArr,
            new GenericArrayData(cells.map(UTF8String.fromString).toArray[Any]))
        }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ParseHtmlTable =
    copy(child = newChild)

  override def prettyName: String = "parse_html_table"
}
