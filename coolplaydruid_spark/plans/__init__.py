"""Query planners: one module per Druid query type (SURVEY §2.1), each
compiling a JSON query spec to a DataFrame. The reference's
QueryRunner/QueryToolChest/QueryEngine decomposition
(query/query-internal-procedure.md:98-142, query/query-01.jpg) maps to:
these planners (per query type) + Catalyst physical planning + executors.
"""
