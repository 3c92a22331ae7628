"""Custom operators: compositions of built-in DataFrame ops (preferred),
falling back to Arrow-batched Pandas UDFs only where Spark lacks the
primitive.  Each module documents its shuffle/partitioning behavior at
scale."""
