"""Domain-split query modules; assembled by westa_ocr_spark.registry."""
