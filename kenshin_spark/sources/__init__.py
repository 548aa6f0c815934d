from kenshin_spark.sources.line_protocol import events_as_points, parse_metric_lines
from kenshin_spark.sources.pickle_batch import parse_pickle_batches

__all__ = ["parse_metric_lines", "events_as_points", "parse_pickle_batches"]
