"""Statement ingest layer (operators A1-A6, A2, B1-B3).

Re-expression of the reference's `etl.py` Part 2/3 ingest
(etl.py:129-152 smart CSV, :259-335 per-file pipeline, :463-482
directory scan) in a Spark-native shape:

* **One `binaryFile` scan** over the statement directory — files are
  routed to banks by filename keyword (A1, etl.py:453-459) and decoded
  (A4: utf-8 / cp950 / Big5, ``errors='replace'``) inside a single
  Arrow-batched ``mapInPandas``, yielding a distributed ``(path,
  bank_id, pos, line)`` frame.  Line numbers are explicit — they carry
  both header-skip (A3) and the order-dependent forward-fill (E2,
  SURVEY §2.E) without relying on implicit row order.
* **Header detection as a dataflow** (A3, etl.py:137-143): the header
  row of each file is located by keyword scan over the first 50 lines
  with a per-file aggregate, not a driver-side file read; data rows are
  the lines after it, parsed with ``from_csv``.
* **HTML statements** (A5, etl.py:290-304) are flattened to
  cell-separator lines by a stdlib-``HTMLParser`` table extractor inside
  the same decode step (BeautifulSoup/lxml are not required).
* **Excel** (A6, etl.py:312-316) is a driver-side ``pandas.read_excel``
  gated behind an import-try — the workbook engines aren't part of the
  engine's hard dependencies.

Scale design: per-file work parallelizes across executors; the only
driver-side step is reading ONE header line per bank (a KB-sized
``limit(1)`` collect) to compile the per-bank CSV schema.  Statement
files are assumed layout-consistent per bank (the reference's per-bank
``columns_mapping`` encodes the same assumption).
"""

from __future__ import annotations

import csv as _csv
import io
from collections.abc import Iterator
from dataclasses import dataclass, field
from html.parser import HTMLParser
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import schema as S

#: Cell separator used to flatten HTML table rows into "lines".
HTML_CELL_SEP = "\x1f"


@dataclass
class BankSpec:
    """Per-source parsing spec (banks_config.yaml shape,
    configs/banks_configs_example.yaml:12-77)."""

    bank_id: str
    keywords: list[str]  # filename routing tokens (etl.py:453-459)
    columns_mapping: dict[str, str]  # raw header → canonical name
    file_type: str = "csv"  # csv | html | excel
    encoding: str = "utf-8"
    header_keyword: str | None = None


def load_bank_specs(path: str) -> list["BankSpec"]:
    """A8: banks_config.yaml → specs.  YAML shape (per bank id):
    ``file_type``, ``encoding``, ``header_keyword``, ``columns_mapping``
    (configs/banks_configs_example.yaml:12-77) plus the engine's
    ``keywords`` routing list (falling back to the bank id itself)."""
    from .configs import load_yaml_config

    cfg = load_yaml_config(path)
    specs = []
    for bank_id, spec in (cfg or {}).items():
        if not isinstance(spec, dict):
            continue
        specs.append(
            BankSpec(
                bank_id=bank_id,
                keywords=list(spec.get("keywords") or [bank_id]),
                columns_mapping=dict(spec.get("columns_mapping") or {}),
                file_type=spec.get("file_type", "csv"),
                encoding=spec.get("encoding", "utf-8"),
                header_keyword=spec.get("header_keyword"),
            )
        )
    return specs


#: Default specs replicating the reference's four banks
#: (configs/banks_configs_example.yaml; FIXTURES.md §1).
DEFAULT_BANK_SPECS: list[BankSpec] = [
    BankSpec(
        bank_id="esun_bank",
        keywords=["玉山"],
        file_type="csv",
        encoding="utf-8",
        header_keyword="交易日期",
        columns_mapping={
            "交易日期": S.TRANSACTION_DATE,
            "入帳日期": S.POSTING_DATE,
            "卡號末四碼": S.CARD_NO,
            "交易說明": S.MERCHANT,
            "外幣金額": S.CURRENCY_AMOUNT,
            "臺幣金額": S.AMOUNT,
        },
    ),
    BankSpec(
        bank_id="cube_bank",
        keywords=["國泰", "國泰世華"],
        file_type="csv",
        encoding="utf-8",
        header_keyword="信用卡號",
        columns_mapping={
            "交易日": S.TRANSACTION_DATE,
            "入帳日": S.POSTING_DATE,
            "卡號末四碼": S.CARD_NO,
            "交易說明": S.MERCHANT,
            "臺幣金額": S.AMOUNT,
            "消費地/幣別": S.RAW_COUNTRY_CURRENCY,
        },
    ),
    BankSpec(
        bank_id="ctbc_bank",
        keywords=["中信", "中國信託"],
        file_type="csv",
        encoding="cp950",
        header_keyword="消費日期",
        columns_mapping={
            "消費日期": S.TRANSACTION_DATE,
            "入帳日期": S.POSTING_DATE,
            "卡號末四碼": S.CARD_NO,
            "商店名稱": S.MERCHANT,
            "臺幣金額": S.AMOUNT,
            "外幣金額": S.CURRENCY_AMOUNT,
            "幣別": S.CURRENCY_TYPE,
        },
    ),
    BankSpec(
        bank_id="hncb_bank",
        keywords=["華南"],
        file_type="html",
        encoding="big5",
        header_keyword="交易日期",
        columns_mapping={
            "交易日期": S.TRANSACTION_DATE,
            "入帳日期": S.POSTING_DATE,
            "卡號末四碼": S.CARD_NO,
            "摘要": S.MERCHANT,
            "金額": S.AMOUNT,
        },
    ),
]


class _TableExtractor(HTMLParser):
    """Minimal HTML table reader: collects every <table> as rows of
    trimmed cell texts (whitespace/newlines flattened — etl.py:301)."""

    def __init__(self) -> None:
        super().__init__()
        self.tables: list[list[list[str]]] = []
        self._stack: list[list[list[str]]] = []
        self._row: list[str] | None = None
        self._cell: list[str] | None = None

    def handle_starttag(self, tag: str, attrs: Any) -> None:
        if tag == "table":
            self._stack.append([])
        elif tag == "tr" and self._stack:
            self._row = []
        elif tag in ("td", "th") and self._row is not None:
            self._cell = []

    def handle_endtag(self, tag: str) -> None:
        if tag == "table" and self._stack:
            self.tables.append(self._stack.pop())
        elif tag == "tr" and self._stack and self._row is not None:
            self._stack[-1].append(self._row)
            self._row = None
        elif tag in ("td", "th") and self._cell is not None and self._row is not None:
            self._row.append(" ".join("".join(self._cell).split()))
            self._cell = None

    def handle_data(self, data: str) -> None:
        if self._cell is not None:
            self._cell.append(data)


def html_table_lines(text: str, header_keyword: str | None) -> list[str]:
    """A5: rows of the table containing ``header_keyword``, flattened to
    HTML_CELL_SEP-joined lines (etl.py:290-304)."""
    parser = _TableExtractor()
    parser.feed(text)
    for table in parser.tables:
        if header_keyword is None or any(
            header_keyword in cell for row in table for cell in row
        ):
            return [HTML_CELL_SEP.join(row) for row in table]
    return []


def route_bank(filename: str, specs: list[BankSpec]) -> BankSpec | None:
    """A1: filename keyword → bank spec (first match, etl.py:470-474)."""
    for spec in specs:
        if any(kw in filename for kw in spec.keywords):
            return spec
    return None


_LINES_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("bank_id", T.StringType()),
        T.StructField("pos", T.LongType()),
        T.StructField("line", T.StringType()),
    ]
)


def statement_lines(
    spark: SparkSession, data_dir: str, specs: list[BankSpec] | None = None
) -> DataFrame:
    """A1+A4+A5: one distributed (path, bank_id, pos, line) frame over
    every routable statement file under ``data_dir``."""
    specs = specs if specs is not None else DEFAULT_BANK_SPECS
    spec_list = list(specs)

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.{csv,html,xls,xlsx}")
        .load(data_dir)
        .select("path", "content")
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[tuple[str, str, int, str]] = []
            for path, content in zip(pdf["path"], pdf["content"]):
                name = path.rsplit("/", 1)[-1]
                spec = route_bank(name, spec_list)
                if spec is None:
                    continue
                text = bytes(content).decode(spec.encoding, errors="replace")
                if spec.file_type == "html":
                    lines = html_table_lines(text, spec.header_keyword)
                else:
                    lines = text.splitlines()
                out.extend(
                    (path, spec.bank_id, i, ln) for i, ln in enumerate(lines)
                )
            yield pd.DataFrame(out, columns=["path", "bank_id", "pos", "line"])

    return files.mapInPandas(decode, _LINES_SCHEMA)


def filename_meta(path_col: F.Column) -> dict[str, F.Column]:
    """A2 (etl.py:272-282): billing year/month from the filename —
    ROC era ``113年1月`` (+1911) takes precedence over western
    ``202401``; defaults 2024/1."""
    name = F.element_at(F.split(path_col, "/"), -1)
    west_y = F.regexp_extract(name, r"(20\d{2})(\d{2})", 1)
    west_m = F.regexp_extract(name, r"(20\d{2})(\d{2})", 2)
    roc_y = F.regexp_extract(name, r"(\d{2,3})年(\d{1,2})月", 1)
    roc_m = F.regexp_extract(name, r"(\d{2,3})年(\d{1,2})月", 2)
    base_year = (
        F.when(roc_y != "", roc_y.cast("int") + 1911)
        .when(west_y != "", west_y.cast("int"))
        .otherwise(F.lit(2024))
    )
    bill_month = (
        F.when(roc_m != "", roc_m.cast("int"))
        .when(west_m != "", west_m.cast("int"))
        .otherwise(F.lit(1))
    )
    return {"base_year": base_year, "bill_month": bill_month}


def _header_positions(lines: DataFrame, spec: BankSpec) -> DataFrame:
    """A3: per-file header line position — first of the first 50 lines
    containing the keyword; files without one fall back to line 0
    (etl.py:137-149)."""
    if spec.header_keyword is None:
        return lines.select("path").distinct().withColumn("hpos", F.lit(0))
    hits = lines.where(
        (F.col("pos") <= 50) & F.col("line").contains(spec.header_keyword)
    )
    found = hits.groupBy("path").agg(F.min("pos").alias("hpos"))
    # one row per FILE on both sides — broadcast keeps the join
    # hash-based however the stats look (no per-path sort of anything)
    return (
        lines.select("path")
        .distinct()
        .join(F.broadcast(found), "path", "left")
        .na.fill({"hpos": 0})
    )


def _split_header(header_line: str, sep: str) -> list[str]:
    if sep == HTML_CELL_SEP:
        cells = header_line.split(sep)
    else:
        cells = next(_csv.reader(io.StringIO(header_line)))
    # B2: trim + flatten whitespace in raw header names (etl.py:301,319).
    return [" ".join(str(c).split()) for c in cells]


def _headers_and_positions(
    lines: DataFrame, specs: list[BankSpec]
) -> tuple[DataFrame, dict[str, str]]:
    """A3 for EVERY bank at once: one distributed header-position pass
    plus ONE driver action for the header lines.

    The per-bank :func:`parse_bank` path pays one ``limit(1).collect()``
    plus a header-position aggregate per spec — with AQE that is
    several Spark jobs per bank, serialized on the driver (r12: the
    4-spec union spent more wall time in driver round-trips than in
    tasks; guide §1.2 fixed costs / §5 driver).  Here the per-file
    header position (first keyword hit in the first 50 lines, else 0)
    is ONE aggregate over all banks — eagerly materialized, so every
    per-bank branch broadcast-joins the same tiny (path, hpos) table —
    and the per-bank header lines come back in ONE ≤|banks|-row
    collect.  The driver holds O(banks) strings; the per-file table
    stays distributed (a 100 TB backfill can have millions of files).

    The header line is taken from the lexicographically first file of
    each bank (statement layouts are per-bank consistent — the same
    assumption the per-bank ``limit(1)`` pick already relied on, made
    deterministic here).  Banks with no files are absent from the map.
    """
    kw_items: list[F.Column] = []
    for s in specs:
        if s.header_keyword is not None:
            kw_items += [F.lit(s.bank_id), F.lit(s.header_keyword)]
    paths = lines.select("path", "bank_id").distinct()
    if kw_items:
        kw = F.create_map(*kw_items)[F.col("bank_id")]
        found = (
            lines.where(
                (F.col("pos") <= 50) & F.col("line").contains(kw)
            )
            .groupBy("path")
            .agg(F.min("pos").alias("hpos"))
        )
        hpos_all = paths.join(found, "path", "left").na.fill({"hpos": 0})
    else:
        hpos_all = paths.withColumn("hpos", F.lit(0))
    # one row per FILE — eager checkpoint so the per-bank broadcast
    # builds scan materialized blocks instead of re-aggregating
    hpos_all = hpos_all.localCheckpoint(eager=True)
    hdr_rows = (
        lines.join(F.broadcast(hpos_all.select("path", "hpos")), "path")
        .where(F.col("pos") == F.col("hpos"))
        .groupBy("bank_id")
        .agg(F.min_by("line", "path").alias("line"))
        .collect()
    )
    return hpos_all, {r["bank_id"]: r["line"] for r in hdr_rows}


def parse_banks(
    lines: DataFrame, specs: list[BankSpec] | None = None
) -> dict[str, DataFrame]:
    """A3+B1+B2 for every bank with one shared header-position pass and
    ONE driver action for all header discovery (see
    :func:`_headers_and_positions`); ``lines`` should be materialized
    (checkpointed/persisted) by the caller — both engine call sites
    already do.  Returns ``{bank_id: parsed}`` for each bank that has
    files, in spec order."""
    specs = list(specs if specs is not None else DEFAULT_BANK_SPECS)
    hpos_all, headers = _headers_and_positions(lines, specs)
    frames: dict[str, DataFrame] = {}
    for spec in specs:
        if spec.bank_id not in headers:
            continue
        parsed = parse_bank(
            lines, spec, precomputed=(headers[spec.bank_id], hpos_all)
        )
        if parsed is not None:
            frames[spec.bank_id] = parsed
    return frames


def parse_bank(
    lines: DataFrame, spec: BankSpec, *,
    precomputed: tuple[str, DataFrame] | None = None,
) -> DataFrame | None:
    """A3+B1+B2+B3: parse one bank's lines into canonical columns.

    Returns null if the bank has no files.  Output carries ``path`` and
    ``pos`` (explicit ingest order for E2) plus ``base_year`` /
    ``bill_month`` (A2) alongside the mapped canonical columns.

    ``precomputed`` is ``(header_line, hpos_all)`` from
    :func:`_headers_and_positions` — multi-bank callers use
    :func:`parse_banks` so header discovery costs one driver action for
    the whole union instead of one per bank; standalone calls keep the
    self-contained per-bank probe below.
    """
    bank_lines = lines.where(F.col("bank_id") == spec.bank_id)
    if precomputed is not None:
        header_line, hpos_all = precomputed
        # the materialized all-banks (path, hpos) table: filter this
        # bank's rows and broadcast — no extra aggregate per bank
        hpos = hpos_all.where(
            F.col("bank_id") == spec.bank_id
        ).select("path", "hpos")
        with_h = bank_lines.join(F.broadcast(hpos), "path")
        raw_names = _split_header(
            header_line, HTML_CELL_SEP if spec.file_type == "html" else ","
        )
        return _parse_bank_tail(with_h, spec, raw_names)
    # hpos is ONE ROW PER FILE (path, header line no) — broadcast it so
    # the fact side (every line of every file) is never sorted/shuffled
    # by path: without the hint Spark picks SortMergeJoin here (sizes
    # unknown behind the datasource scan), which at ingest scale means
    # a full shuffle of the raw lines just to attach one int per file.
    hpos = _header_positions(bank_lines, spec)
    with_h = bank_lines.join(F.broadcast(hpos), "path")

    header_row = (
        with_h.where(F.col("pos") == F.col("hpos")).select("line").limit(1).collect()
    )
    if not header_row:
        return None
    sep = HTML_CELL_SEP if spec.file_type == "html" else ","
    raw_names = _split_header(header_row[0]["line"], sep)
    return _parse_bank_tail(with_h, spec, raw_names)


def _parse_bank_tail(
    with_h: DataFrame, spec: BankSpec, raw_names: list[str]
) -> DataFrame:
    """B1+B2 shared tail: data-row slice + per-column projection."""

    data = with_h.where(
        (F.col("pos") > F.col("hpos")) & (F.trim(F.col("line")) != "")
    )
    if spec.file_type == "html":
        cells = F.split(F.col("line"), HTML_CELL_SEP)
        parsed = data.select(
            "path",
            "pos",
            *[
                F.trim(cells.getItem(i)).alias(f"_c{i}")
                for i in range(len(raw_names))
            ],
        )
    else:
        # _corrupt captures rows the CSV parser rejects (e.g. more
        # fields than the header) — dropping them mirrors the
        # reference's on_bad_lines='skip' (etl.py:146).
        struct_schema = (
            ", ".join(f"`_c{i}` string" for i in range(len(raw_names)))
            + ", `_corrupt` string"
        )
        rec = F.from_csv(
            F.col("line"),
            struct_schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
        )
        parsed = data.select(
            "path",
            "pos",
            *[rec.getItem(f"_c{i}").alias(f"_c{i}") for i in range(len(raw_names))],
            rec.getItem("_corrupt").alias("__corrupt"),
        ).where(F.col("__corrupt").isNull()).drop("__corrupt")

    # B1: keep only mapped columns, rename raw → canonical; B3 init of
    # missing canonical strings happens downstream via schema.conform.
    cols: list[F.Column] = [F.col("path"), F.col("pos")]
    for i, raw in enumerate(raw_names):
        canonical = spec.columns_mapping.get(raw)
        if canonical is not None:
            cols.append(F.col(f"_c{i}").alias(canonical))
    out = parsed.select(*cols).withColumn(S.BANK_NAME, F.lit(spec.bank_id))
    return out.withColumns(filename_meta(F.col("path")))


#: OLE2 / Compound-File-Binary magic — the container of legacy binary
#: .xls workbooks (public format signature, [MS-CFB] 2.2).
_OLE2_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"


def sniff_workbook_format(path: str) -> str:
    """Classify a workbook file by leading bytes, not extension:
    ``xlsx`` (PK zip), ``xls`` (OLE2 compound file), ``html`` (bank
    portals routinely serve HTML with an .xls name), else ``unknown``."""
    with open(path, "rb") as f:
        head = f.read(512)
    if head[:4] == b"PK\x03\x04":
        return "xlsx"
    if head[:8] == _OLE2_MAGIC:
        return "xls"
    if head.lstrip()[:1] == b"<":
        return "html"
    return "unknown"


def read_excel_statement(
    spark: SparkSession, path: str, spec: BankSpec
) -> DataFrame:
    """A6 (etl.py:312-316): driver-side Excel read.  The file format is
    sniffed from magic bytes BEFORE any parser touches it, so an HTML
    table masquerading under an ``.xls`` name (reference README.md:98)
    always parses via the HTML path — even when a pandas Excel engine
    is installed and would raise a raw ValueError/BadZipFile on it —
    a true OLE2 binary .xls goes through the vendored stdlib BIFF8
    parser (sources.xls), and a real .xlsx goes through
    ``pandas.read_excel`` when an engine is installed, else the
    vendored stdlib .xlsx parser (sources.xlsx)."""
    kind = sniff_workbook_format(path)
    if kind == "html":
        with open(path, "rb") as f:
            text = f.read().decode(spec.encoding, errors="replace")
        lines = html_table_lines(text, spec.header_keyword)
        if not lines:
            raise ValueError(f"no matching HTML table in {path}")
        grid = [ln.split(HTML_CELL_SEP) for ln in lines]
        width = len(grid[0])
        body = [r[:width] + [""] * (width - len(r)) for r in grid[1:]]
        pdf = pd.DataFrame(body, columns=grid[0])
    elif kind == "xls":
        from .xls import read_xls_rows

        rows = read_xls_rows(path)
        if not rows:
            raise ValueError(f"empty workbook: {path}")
        pdf = pd.DataFrame(rows[1:], columns=rows[0])
    elif kind == "xlsx":
        try:
            pdf = pd.read_excel(path, dtype=str)
        except (ImportError, ValueError) as e:  # no engine / engine balked
            from .xlsx import read_xlsx_rows

            rows = read_xlsx_rows(path)
            if not rows:
                raise ValueError(f"empty workbook: {path}") from e
            pdf = pd.DataFrame(rows[1:], columns=rows[0])
    else:
        raise NotImplementedError(
            f"{path}: unrecognized workbook format (not zip/.xlsx,"
            " OLE2/.xls, or HTML); convert to .xlsx/CSV."
        )
    pdf.columns = [" ".join(str(c).split()) for c in pdf.columns]
    pdf = pdf.astype(str)  # raw cells as strings BEFORE adding typed cols
    pdf["path"] = path
    pdf["pos"] = range(len(pdf))  # must stay integral: E2 orders on it
    df = spark.createDataFrame(pdf)
    cols = [F.col("path"), F.col("pos").cast("long").alias("pos")]
    for raw, canonical in spec.columns_mapping.items():
        if raw in pdf.columns:
            cols.append(F.col(raw).alias(canonical))
    return (
        df.select(*cols)
        .withColumn(S.BANK_NAME, F.lit(spec.bank_id))
        .withColumns(filename_meta(F.col("path")))
    )
