"""Source layer: ingestion into the canonical signals/channels tables.

The reference's source layer is a File/Channel ABC pair plus an enDAQ
``.ide`` driver (``io.py:14-301``).  Here each source is a batch ingest
that lands data in the canonical long format (SURVEY.md §1.5); analytics
never touch raw formats directly.
"""

from pandas_sigproc_spark.sources.bucketed import (
    read_signals_bucketed,
    write_signals_bucketed,
)
from pandas_sigproc_spark.sources.csv import csv_to_signals, signals_to_csv
from pandas_sigproc_spark.sources.events import events_to_signals, load_table
from pandas_sigproc_spark.sources.json import json_to_signals, signals_to_json
from pandas_sigproc_spark.sources.channel import (
    Channel,
    channels_to_signals,
    collect_channel,
)
from pandas_sigproc_spark.sources.wav import (
    read_wav,
    signals_to_wav,
    wav_to_signals,
    write_wav,
)

__all__ = [
    "read_signals_bucketed",
    "write_signals_bucketed",
    "csv_to_signals",
    "signals_to_csv",
    "json_to_signals",
    "signals_to_json",
    "events_to_signals",
    "load_table",
    "channels_to_signals",
    "collect_channel",
    "Channel",
    "read_wav",
    "write_wav",
    "wav_to_signals",
    "signals_to_wav",
]
