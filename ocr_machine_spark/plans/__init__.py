"""Job plans: lineage-tracked, idempotently-resumable extraction runs."""
