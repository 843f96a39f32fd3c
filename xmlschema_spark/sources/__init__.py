"""Sources: synthetic image+caption table generator and rules loader."""

from xmlschema_spark.sources.images import IMAGE_SCHEMA, generate_images_pdf, generate_images_df
from xmlschema_spark.sources.rules_loader import load_rules_json, rules_to_df
from xmlschema_spark.sources.scan import ensure_scan_parallelism

__all__ = [
    "IMAGE_SCHEMA",
    "generate_images_pdf",
    "generate_images_df",
    "load_rules_json",
    "rules_to_df",
    "ensure_scan_parallelism",
]
