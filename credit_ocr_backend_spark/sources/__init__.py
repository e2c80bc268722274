"""Sources & sinks: synthetic page corpus, stage checkpoint tables, lineage."""
