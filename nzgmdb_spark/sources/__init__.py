"""Sources & sinks (SURVEY.md §2.1 S1-S16).

Local formats (CSV, whitespace text, binary blobs, partitioned parquet)
are real Spark readers/writers. Network-backed sources (GeoNet HTTP,
FDSN, GitHub) are driver-side fetchers with an injectable transport so
they are unit-testable offline and never imported eagerly.
"""

from nzgmdb_spark.sources.csv_io import (  # noqa: F401
    read_csv_table,
    read_whitespace_table,
    write_csv_table,
)
from nzgmdb_spark.sources.files import (  # noqa: F401
    discover_record_files,
    read_partitioned,
    write_partitioned_idempotent,
)
from nzgmdb_spark.sources.waveforms import (  # noqa: F401
    decode_waveform_blobs,
    read_waveform_blobs,
    write_waveform_ascii,
)
