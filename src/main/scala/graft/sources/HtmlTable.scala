package graft.sources

import scala.util.matching.Regex

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** HTML market-table scan (SURVEY.md §2.1 SRC1).
  *
  * Reproduces the reference's table extraction semantics
  * (reference scraper/table_scraper.py:4-43): the page's
  * `<table class="alltable">` is parsed with headers taken from
  * `<thead>` `<th class="header">` text, rows from `<tbody>` `<tr>` with the
  * first cell a `td.tleft2` and the rest `td.tleft`, every cell
  * whitespace-stripped; a page with no such table / thead / tbody yields
  * None (table_scraper.py:11).
  *
  * Implementation is a small pure-Scala regex scanner (no jsoup — zero-dep),
  * exposed two ways:
  * - `parse(html)` — driver-side, for the ingest connector path;
  * - `ingest(spark, html)` — a DataFrame with the table's dynamic
  *   schema-on-read columns (all StringType, like the reference).
  *
  * Scale path: at fleet scale pages LAND AS FILES; `readPages` scans them
  * wholetext and `parsePages` runs this parser executor-side through the
  * `graft.plans.ParseHtmlTable` Generator — the parse is embarrassingly
  * parallel and never touches the driver. `ingest` remains the one-page
  * driver-side connector form.
  */
object HtmlTable {

  final case class Parsed(headers: Seq[String], rows: Seq[Seq[String]])

  private val TableRe: Regex =
    """(?is)<table[^>]*class=["'][^"']*\balltable\b[^"']*["'][^>]*>(.*?)</table>""".r
  private val TheadRe: Regex = """(?is)<thead[^>]*>(.*?)</thead>""".r
  private val TbodyRe: Regex = """(?is)<tbody[^>]*>(.*?)</tbody>""".r
  private val HeaderThRe: Regex =
    """(?is)<th[^>]*class=["'][^"']*\bheader\b[^"']*["'][^>]*>(.*?)</th>""".r
  private val TrRe: Regex = """(?is)<tr[^>]*>(.*?)</tr>""".r
  private val TdRe: Regex =
    """(?is)<td[^>]*class=["'][^"']*\btleft2?\b[^"']*["'][^>]*>(.*?)</td>""".r

  /** Strip nested tags + decode the entities the market pages use. */
  private def cellText(inner: String): String =
    inner.replaceAll("(?is)<[^>]*>", "")
      .replace("&nbsp;", " ")
      .replace("&amp;", "&")
      .replace("&lt;", "<")
      .replace("&gt;", ">")
      .replace("&quot;", "\"")
      .replace("&#39;", "'")
      .trim

  /** Parse the first `table.alltable`; None when the table, its thead, or
    * its tbody is missing or yields no headers (reference behavior).
    */
  def parse(html: String): Option[Parsed] =
    for {
      table <- TableRe.findFirstMatchIn(html).map(_.group(1))
      thead <- TheadRe.findFirstMatchIn(table).map(_.group(1))
      tbody <- TbodyRe.findFirstMatchIn(table).map(_.group(1))
      headers = HeaderThRe.findAllMatchIn(thead).map(m => cellText(m.group(1))).toSeq
      if headers.nonEmpty
    } yield {
      val rows = TrRe.findAllMatchIn(tbody).map { tr =>
        TdRe.findAllMatchIn(tr.group(1)).map(m => cellText(m.group(1))).toSeq
      }.filter(_.nonEmpty)
        // positional binding to headers, padding short rows (header drift)
        .map(cells => cells.take(headers.size).padTo(headers.size, ""))
        .toSeq
      Parsed(headers, rows)
    }

  /** Scalar date extraction (SRC3): `div#right2 > b` text, None if absent
    * (reference scraper/date_scraper.py:3-12).
    */
  private val DateRe: Regex =
    """(?is)<div[^>]*id=["']right2["'][^>]*>.*?<b[^>]*>(.*?)</b>""".r

  def scrapeDate(html: String): Option[String] =
    DateRe.findFirstMatchIn(html).map(m => cellText(m.group(1))).filter(_.nonEmpty)

  /** The table as a DataFrame with its own dynamic all-string schema
    * (schema-on-read, like the reference's header-derived pandas frame).
    * Empty DataFrame with no columns when the page has no parseable table.
    */
  /** Distributed page scan: every landed page file under `path` (glob ok)
    * as one (page_path, html) row — wholetext, one file per row.
    */
  def readPages(spark: SparkSession, path: String): DataFrame =
    spark.read.option("wholetext", "true").text(path)
      .select(input_file_name().as("page_path"), col("value").as("html"))

  /** The scraped date as a Column (the executor-side twin of `scrapeDate`;
    * null when the page has no date div). Entity decoding is skipped — the
    * market pages carry plain `yyyy-MM-dd` text in the date element.
    */
  def scrapeDateCol(html: Column): Column = {
    val raw = regexp_extract(html,
      "(?is)<div[^>]*id=[\"']right2[\"'][^>]*>.*?<b[^>]*>(.*?)</b>", 1)
    val cleaned = trim(regexp_replace(raw, "(?is)<[^>]*>", ""))
    when(cleaned === "", lit(null)).otherwise(cleaned)
  }

  /** Distributed parse: one output row per table body row of every page —
    * (page_path, scrape_date, row_idx, headers, cells); pages with no
    * parseable table contribute zero rows. Runs where the files land.
    */
  def parsePages(pages: DataFrame): DataFrame = {
    val gen = ColumnBridge.column(
      graft.plans.ParseHtmlTable(ColumnBridge.expression(col("html"))))
    pages.select(
      col("page_path"),
      scrapeDateCol(col("html")).as("scrape_date"),
      gen.as(Seq("row_idx", "headers", "cells")))
  }

  def ingest(spark: SparkSession, html: String): DataFrame =
    parse(html) match {
      case None =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], StructType(Nil))
      case Some(Parsed(headers, rows)) =>
        // scraped tables can repeat header text; suffix duplicates so
        // downstream col(name) references stay unambiguous
        val seen = scala.collection.mutable.Map.empty[String, Int]
        val unique = headers.map { h =>
          val n = seen.getOrElse(h, 0); seen(h) = n + 1
          if (n == 0) h else s"${h}_${n + 1}"
        }
        val schema = StructType(unique.map(h => StructField(h, StringType)))
        spark.createDataFrame(
          spark.sparkContext.parallelize(rows.map(Row.fromSeq)), schema)
    }
}
