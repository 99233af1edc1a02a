"""HTML page → report rows: the reference's one genuinely procedural
hot loop, done Spark-side.

The reference fetches a report page per address and XPath-extracts the
table cells, then walks the flat td list three at a time into
(date, type, description) rows (bitcoinabuse/main.go:279-289:
``report[i%3] = node.FirstChild.Data; if i%3 == 2 append``). The same
stride-3 walk exists relationally as ``reshape_3col``
(operators/projections.py); this module pins the *procedural* form: a
real HTML parser (stdlib ``html.parser``) running inside
``mapInPandas``, one page row in → many report rows out.

Because the container ships no HTML fixtures, the page corpus is
rendered deterministically from the events table inside the same plan
(JVM-side ``format_string``/``concat`` with entity escaping), so the
DuckDB oracle can state the expected parse output directly from events
— the parser must invert the rendering (tag soup, entity unescape,
stride-3 walk) exactly to go green.

Scale shape: rendering is a single groupBy(user_id) shuffle; parsing is
a narrow mapInPandas over page rows — pages never co-locate beyond
their own group, no driver collect, parser state is per-page. At 100 TB
the pages would arrive as a binary/text column from the landing zone
and only the mapInPandas stage remains.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from labelmain_spark.sources.readers import load_table

REPORT_SCHEMA = "user_id bigint, report_date string, abuse_type string, description string"


def _esc(col):
    """Minimal HTML entity escaping (&, <, >, ") — order matters: & first."""
    out = F.replace(col, F.lit("&"), F.lit("&amp;"))
    out = F.replace(out, F.lit("<"), F.lit("&lt;"))
    out = F.replace(out, F.lit(">"), F.lit("&gt;"))
    return F.replace(out, F.lit('"'), F.lit("&quot;"))


def render_report_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One synthetic report page per user: their events as the
    reference's report table (/html/body/div/main/div[2]/table/tbody).
    Descriptions contain <, >, &, " so a parser that skips entity
    decoding cannot match the oracle."""
    ev = load_table(spark, sf_dir, "events")
    cell_date = F.date_format("ts", "yyyy-MM-dd HH:mm:ss")
    desc = F.concat(
        F.lit('case <'), F.col("event_id").cast("string"), F.lit('> & "flagged"')
    )
    row_html = F.concat(
        F.lit("<tr><td>"), _esc(cell_date),
        F.lit("</td><td>"), _esc(F.col("event_type")),
        F.lit("</td><td>"), _esc(desc),
        F.lit("</td></tr>"),
    )
    rows = ev.select(
        "user_id",
        F.struct(F.col("ts"), F.col("event_id"), row_html.alias("html")).alias("r"),
    )
    return rows.groupBy("user_id").agg(
        F.concat(
            F.lit("<html><body><div><main><div>nav</div><div><table><tbody>"),
            F.array_join(
                F.transform(F.array_sort(F.collect_list("r")), lambda r: r["html"]),
                "",
            ),
            F.lit("</tbody></table></div></main></div></body></html>"),
        ).alias("page_html")
    )


def _parse_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Real HTML parsing per page: collect td-cell text (entities
    decoded by html.parser), then the reference's stride-3 walk."""
    from html.parser import HTMLParser

    class TdCollector(HTMLParser):
        def __init__(self) -> None:
            super().__init__(convert_charrefs=True)
            self.cells: list[str] = []
            self._in_td = False
            self._buf: list[str] = []

        def handle_starttag(self, tag: str, attrs) -> None:
            if tag == "td":
                self._in_td, self._buf = True, []

        def handle_endtag(self, tag: str) -> None:
            if tag == "td":
                self.cells.append("".join(self._buf))
                self._in_td = False

        def handle_data(self, data: str) -> None:
            if self._in_td:
                self._buf.append(data)

    for pdf in batches:
        out: list[tuple[int, str, str, str]] = []
        for uid, page in zip(pdf["user_id"], pdf["page_html"]):
            p = TdCollector()
            p.feed(page)
            report = ["", "", ""]
            for i, cell in enumerate(p.cells):  # main.go:282-288 walk
                report[i % 3] = cell
                if i % 3 == 2:
                    out.append((int(uid), report[0], report[1], report[2]))
                    report = ["", "", ""]
        yield pd.DataFrame(
            {
                "user_id": pd.Series([r[0] for r in out], dtype="int64"),
                "report_date": pd.Series([r[1] for r in out], dtype="object"),
                "abuse_type": pd.Series([r[2] for r in out], dtype="object"),
                "description": pd.Series([r[3] for r in out], dtype="object"),
            }
        )


def parse_html_reports(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4/P5: render the page corpus, then parse it back to rows with a
    real procedural parser in mapInPandas."""
    pages = render_report_pages(spark, sf_dir)
    return pages.mapInPandas(_parse_batches, schema=REPORT_SCHEMA)


QUERIES = {"parse_html_reports": parse_html_reports}

# The oracle states the round-trip directly: parse(render(events)) must
# give back exactly the events-derived cells.
ORACLE = {
    "parse_html_reports": """
        SELECT user_id,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS report_date,
               event_type AS abuse_type,
               'case <' || CAST(event_id AS VARCHAR) || '> & "flagged"' AS description
        FROM events
    """,
}
