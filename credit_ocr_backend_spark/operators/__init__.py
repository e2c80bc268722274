"""Arrow-batched pipeline stages and corpus-level operators."""
