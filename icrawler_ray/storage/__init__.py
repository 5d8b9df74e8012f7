from icrawler_ray.storage.sinks import (  # noqa: F401
    BaseSink,
    FileSystemSink,
    ParquetDirSink,
    resolve_sink,
    write_results,
)
