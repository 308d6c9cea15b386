"""IO readers: padded TSV (S8), JSON-records (S9)."""

from __future__ import annotations

from blspark.clean import coerce_numeric, trim_string_columns
from blspark.io.readers import read_json_records, read_padded_tsv


def test_read_padded_tsv_strips_headers_keeps_cell_padding(spark, tmp_path):
    p = tmp_path / "pr.data.0.Current"
    p.write_text(
        "series_id        \tyear\tperiod\t       value\tfootnote_codes\n"
        "PRS30006011      \t1995\tQ01\t         2.6\t\n"
        "PRS30006011      \t1995\tQ02\t         2.1\t\n"
    )
    df = read_padded_tsv(spark, str(p))
    assert df.columns == ["series_id", "year", "period", "value", "footnote_codes"]
    raw = df.first()
    # cell padding survives the scan (the cleaning layer trims it,
    # matching the reference's order of operations)
    assert raw["series_id"].startswith("PRS30006011 ")
    clean = coerce_numeric(
        trim_string_columns(df), {"year": "int", "value": "double"}
    )
    row = clean.first()
    assert row["series_id"] == "PRS30006011"
    assert row["year"] == 1995 and row["value"] == 2.6


def test_read_json_records_extracts_nested_array(spark, tmp_path):
    p = tmp_path / "population_data_20240101_000000.json"
    p.write_text(
        '{"data": [{"Nation ID": "01000US", "Nation": "United States", '
        '"Year": 2013, "Population": 316128839}, '
        '{"Nation ID": "01000US", "Nation": "United States", '
        '"Year": 2014, "Population": 318857056}], '
        '"source": [{"annotations": {}}]}'
    )
    df = read_json_records(spark, str(p))
    assert sorted(df.columns) == ["Nation", "Nation ID", "Population", "Year"]
    rows = df.orderBy("Year").collect()
    assert rows[0]["Year"] == 2013 and rows[0]["Population"] == 316128839
    assert len(rows) == 2
