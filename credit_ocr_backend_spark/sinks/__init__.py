from credit_ocr_backend_spark.sinks.export import (  # noqa: F401
    export_results_xlsx,
    render_annotated_png,
)
