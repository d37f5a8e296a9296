"""Contract tests for the live-API connector request paths.

The sandbox has neither google-api-python-client nor the
spark-bigquery connector jar, so the request-construction code
(reference behavior: syncquill.py:60-76 Sheets scan, 38-52 BigQuery
scan, 131-146 truncate load) previously only executed its raise-guard.
These tests inject fakes — a stub googleapiclient module and recording
reader/writer chains — so the spreadsheetId/range plumbing, table-ref
composition, and write dispositions are exercised end-to-end without
GCP.
"""

from __future__ import annotations

import sys
import types

import pytest

from syncquill_spark.sources.bigquery import BigQueryTable
from syncquill_spark.sources.sheets import SheetsTable


# ---------------------------------------------------------------------------
# Sheets: stub googleapiclient.discovery.build
# ---------------------------------------------------------------------------


class _FakeSheetsService:
    """Records the values().get(...) request; returns a canned grid."""

    def __init__(self, grid):
        self.grid = grid
        self.requests = []

    def spreadsheets(self):
        return self

    def values(self):
        return self

    def get(self, spreadsheetId, range):  # noqa: A002 — API kwarg name
        self.requests.append({"spreadsheetId": spreadsheetId, "range": range})
        return self

    def execute(self):
        return {"values": self.grid}


@pytest.fixture
def fake_gapi(monkeypatch):
    grid = [["slno", "name"], ["1", "alpha"], ["2", None], ["3"]]
    service = _FakeSheetsService(grid)
    built = []

    def build(api, version, credentials=None):
        built.append({"api": api, "version": version, "credentials": credentials})
        return service

    discovery = types.ModuleType("googleapiclient.discovery")
    discovery.build = build
    pkg = types.ModuleType("googleapiclient")
    pkg.discovery = discovery
    monkeypatch.setitem(sys.modules, "googleapiclient", pkg)
    monkeypatch.setitem(sys.modules, "googleapiclient.discovery", discovery)
    return service, built


def test_sheets_read_requests_configured_range(spark, fake_gapi):
    """Reference syncquill.py:60-66: one values().get on the configured
    spreadsheet id + A1 range, header popped, all-string frame."""
    service, built = fake_gapi
    tbl = SheetsTable("sheet-123", "Sheet1!A1:B100", credentials="tok")
    df = tbl.read(spark)

    assert built == [{"api": "sheets", "version": "v4", "credentials": "tok"}]
    assert service.requests == [
        {"spreadsheetId": "sheet-123", "range": "Sheet1!A1:B100"}
    ]
    assert df.columns == ["slno", "name"]
    rows = {tuple(r) for r in df.collect()}
    # short row padded with NULL, None cell preserved as NULL
    assert rows == {("1", "alpha"), ("2", None), ("3", None)}


def test_sheets_read_empty_sheet_raises(spark, fake_gapi):
    service, _ = fake_gapi
    service.grid = []
    with pytest.raises(ValueError, match="empty sheet"):
        SheetsTable("s", "r").read(spark)


def test_sheets_read_without_client_lib_raises_cleanly(spark, monkeypatch):
    monkeypatch.setitem(sys.modules, "googleapiclient", None)
    monkeypatch.setitem(sys.modules, "googleapiclient.discovery", None)
    with pytest.raises(NotImplementedError, match="google-api-python-client"):
        SheetsTable("s", "r").read(spark)


# ---------------------------------------------------------------------------
# BigQuery: recording reader/writer chains
# ---------------------------------------------------------------------------


class _Recorder:
    """Chainable stand-in for DataFrameReader/Writer that records calls."""

    def __init__(self, log, fail_load=False):
        self.log = log
        self.fail_load = fail_load

    def format(self, fmt):
        self.log.append(("format", fmt))
        return self

    def option(self, k, v):
        self.log.append(("option", k, v))
        return self

    def mode(self, m):
        self.log.append(("mode", m))
        return self

    def load(self):
        self.log.append(("load",))
        if self.fail_load:
            raise RuntimeError("Failed to find data source: bigquery")
        return "df-sentinel"

    def save(self):
        self.log.append(("save",))


def test_bigquery_table_ref_composition():
    assert BigQueryTable("ds", "tbl")._table_ref == "ds.tbl"
    assert BigQueryTable("ds", "tbl", project="proj")._table_ref == "proj.ds.tbl"


def test_bigquery_read_builds_connector_request():
    """Reference syncquill.py:38-42 scans the configured table; here the
    scan goes through format("bigquery") with the fully-qualified ref
    (column pruning/pushdown then happen inside the connector)."""
    log = []
    fake_spark = types.SimpleNamespace(read=_Recorder(log))
    out = BigQueryTable("ds", "t", project="p").read(fake_spark)
    assert out == "df-sentinel"
    assert log == [
        ("format", "bigquery"),
        ("option", "table", "p.ds.t"),
        ("load",),
    ]


def test_bigquery_read_missing_connector_raises_cleanly():
    log = []
    fake_spark = types.SimpleNamespace(read=_Recorder(log, fail_load=True))
    with pytest.raises(NotImplementedError, match="spark-bigquery connector"):
        BigQueryTable("ds", "t").read(fake_spark)


@pytest.mark.parametrize(
    ("method", "mode"), [("overwrite", "overwrite"), ("append", "append")]
)
def test_bigquery_write_dispositions(method, mode):
    """Truncate-load vs append (reference 131-146 / 90-99): both write
    through the direct writer with the right SaveMode — one atomic job,
    not N+1 DML statements."""
    log = []
    fake_df = types.SimpleNamespace(write=_Recorder(log))
    getattr(BigQueryTable("ds", "t"), method)(fake_df)
    assert log == [
        ("format", "bigquery"),
        ("option", "table", "ds.t"),
        ("option", "writeMethod", "direct"),
        ("mode", mode),
        ("save",),
    ]
