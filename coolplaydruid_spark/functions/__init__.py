"""Query-component compilers: granularities, filters, extraction functions,
aggregators, post-aggregators (reference: query/query-module-overview.md:40-46
declares the components; query/query-timeseries.md specifies the exemplars)."""
