"""Canonical table schemas for the engine (SURVEY.md §1.5, FIXTURES.md).

The reference models data as unit-annotated pandas Series (one per channel,
``extension.py:241`` / ``extension.py:19``).  The Spark engine replaces that
with three fixed long-format schemas; per-channel operators become
``groupBy("channel_id")`` operations, and the out-of-band metadata the
reference keeps on accessor instances (``extension.py:28, 250, 302-313``)
lives in the ``channels`` catalog where lazy plans can't drop it.
"""

from pyspark.sql import types as T

#: Time-domain channels, long format.  ``t`` is relative seconds (the
#: reference's float index variant, ``extension.py:320-321``); ``ts`` is the
#: optional absolute timestamp (datetime64 variant, ``extension.py:318-319``).
SIGNALS_SCHEMA = T.StructType(
    [
        T.StructField("channel_id", T.StringType(), False),
        T.StructField("t", T.DoubleType(), False),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

#: Frequency-domain series (PSD / SRS envelope / spec lines).  ``freq`` is Hz,
#: strictly positive after PSD (``extension.py:619-620``).
SPECTRA_SCHEMA = T.StructType(
    [
        T.StructField("channel_id", T.StringType(), False),
        T.StructField("freq", T.DoubleType(), False),
        T.StructField("power", T.DoubleType(), True),
    ]
)

#: Channel catalog — the reference's Series ``name`` / ``unit`` /
#: ``start_time`` / inferred ``samplerate`` metadata (SURVEY.md §1.3), made
#: first-class.  ``samplerate`` NULL ⇔ non-uniform channel (clean semantics
#: for the reference's buggy tolerance check, ``extension.py:288-297``).
CHANNELS_SCHEMA = T.StructType(
    [
        T.StructField("channel_id", T.StringType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("unit", T.StringType(), True),
        T.StructField("start_time", T.TimestampType(), True),
        T.StructField("samplerate", T.DoubleType(), True),
    ]
)

#: Output of rainflow cycle counting (``extension.py:936-961``): one row per
#: cycle-range bin per channel; half cycles allowed (0.5 steps).
RAINFLOW_SCHEMA = T.StructType(
    [
        T.StructField("channel_id", T.StringType(), False),
        T.StructField("bin", T.DoubleType(), False),
        T.StructField("cycles", T.DoubleType(), False),
    ]
)
