"""Sources & sinks.

``xlsx/`` — the custom XLSX source/sink (Python Data Source API), the one
format Spark does not ship.  CSV/Parquet/JSON/ORC are Spark built-ins and
are exposed through thin option-mapping helpers in ``formats.py``; cloud
filesystem configuration (S3A endpoint/credential parity with the
reference's builders) lives in ``cloud.py``.
"""
