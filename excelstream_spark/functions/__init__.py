"""Column-level function library.

All functions return Spark ``Column`` expressions built from
``pyspark.sql.functions`` — they stay JVM-side inside whole-stage codegen
(no Python UDFs in any hot path).  Excel-semantics functions live in
``excel.py``; text-corpus functions in ``text.py``; vector math in
``vectors.py``.
"""
