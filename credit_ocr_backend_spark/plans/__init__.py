"""Job plans: session config, the end-to-end extraction pipeline."""
