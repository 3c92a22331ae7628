"""In-memory workbook/CSV bytes for HTTP responses.

Reference parity: HttpExcelWriter / HttpCsvWriter build a whole file in an
in-memory buffer and return the bytes for an HTTP response body
(/root/reference/src/cloud/http_writer.rs, src/http_csv_writer.rs).  This
is the ONE deliberately driver-side small-result path in this repo: the
result of an analytical query that a human downloads is bounded by
``max_rows`` (guarded, not implicit).

For big exports the right pattern is documented in the functions: write
distributed to object storage and hand out a presigned URL.
"""

from __future__ import annotations

import csv
import gzip
import io

from pyspark.sql import DataFrame

from excelstream_spark.sources.xlsx.writer_core import WorkbookWriter

XLSX_CONTENT_TYPE = (
    "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet"
)
CSV_CONTENT_TYPE = "text/csv; charset=utf-8"

DEFAULT_MAX_ROWS = 1_000_000  # reference benches 1M rows in-memory (~64 MB)


class ResultTooLargeError(ValueError):
    pass


def _iter_rows_bounded(df: DataFrame, max_rows: int):
    """Stream rows to the driver partition-by-partition (toLocalIterator —
    never materializes the whole result) with a hard row guard."""
    n = 0
    for row in df.toLocalIterator():
        n += 1
        if n > max_rows:
            raise ResultTooLargeError(
                f"result exceeds max_rows={max_rows}; write to object storage "
                "and serve a presigned URL instead"
            )
        yield row


def dataframe_to_xlsx_bytes(
    df: DataFrame,
    sheet_name: str = "Sheet1",
    header: bool = True,
    compression: int = 6,
    max_rows: int = DEFAULT_MAX_ROWS,
) -> bytes:
    """Serialize a (bounded) DataFrame to xlsx bytes for an HTTP response."""
    buf = io.BytesIO()
    with WorkbookWriter(buf, compression=compression) as wb:
        wb.add_sheet(sheet_name)
        if header:
            wb.write_header(df.columns)
        for row in _iter_rows_bounded(df, max_rows):
            wb.write_row(list(row))
    return buf.getvalue()


def dataframe_to_csv_bytes(
    df: DataFrame,
    header: bool = True,
    delimiter: str = ",",
    gzip_compress: bool = False,
    max_rows: int = DEFAULT_MAX_ROWS,
) -> bytes:
    """Serialize a (bounded) DataFrame to (optionally gzipped) CSV bytes
    (RFC-4180 quoting via the stdlib csv writer)."""
    text = io.StringIO()
    w = csv.writer(text, delimiter=delimiter, quoting=csv.QUOTE_MINIMAL, lineterminator="\r\n")
    if header:
        w.writerow(df.columns)
    for row in _iter_rows_bounded(df, max_rows):
        w.writerow(["" if v is None else v for v in row])
    data = text.getvalue().encode("utf-8")
    if gzip_compress:
        data = gzip.compress(data, compresslevel=6)
    return data


def http_response_headers(filename: str, content_type: str) -> dict[str, str]:
    """Convenience: download headers for Flask/FastAPI responses."""
    return {
        "Content-Type": content_type,
        "Content-Disposition": f'attachment; filename="{filename}"',
    }
