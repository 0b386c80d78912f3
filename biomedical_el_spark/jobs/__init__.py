"""spark-submit entry points (north_rule: 'ships as spark-submit
--py-files on multi-executor clusters')."""
