"""Custom operators the reference implies but Spark lacks as built-ins.

Each operator is a composition of DataFrame primitives first (so Catalyst
still owns the physical plan), a Pandas-UDF fallback only where column
algebra genuinely can't express the semantics (SURVEY.md §2.11).
"""
