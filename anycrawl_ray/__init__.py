"""anycrawl_ray — a Ray-Data-native rebuild of AnyCrawl's crawl core.

Built from scratch on ray.data.Dataset + Arrow batches (see SURVEY.md).
Reference semantics: any4ai/AnyCrawl @ /root/reference (cited per-module as
``reference <path>:<lines>``); execution model is Ray-Data-first, not a port.
"""

__version__ = "0.1.0"
