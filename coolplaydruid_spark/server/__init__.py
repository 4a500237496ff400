"""HTTP facade mirroring the reference's REST surface
(query/query-module-overview.md:3-6,55-59; arch/indexing-service/
indexing-service-submit-task.md:13-98)."""
