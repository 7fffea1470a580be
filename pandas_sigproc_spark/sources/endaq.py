"""enDAQ/SlamStick ``.ide`` ingest (reference ``Endaq``/``EndaqChannel``,
``io.py:161-301``).

The ``endaq`` package is not installed in this environment, so the driver
is import-gated: construction raises a clear ImportError until the
dependency is present; everything downstream of the raw read reuses the
generic :class:`~pandas_sigproc_spark.sources.channel.Channel` ingest.

Design (SURVEY.md §2.1 Endaq row): ``.ide`` is a single-file EBML log —
not splittable — so ingest parallelism is per *file* (one task opens one
file, emits its channels) rather than per byte range.  ``ingest_ide_dir``
fans a directory of logs across the cluster with one task per file via
``spark.sparkContext.parallelize``, which is the right shape for the
"thousands of logger files" case; analytics then run on the canonical
parquet, never re-touching the raw format.
"""

from __future__ import annotations

from pandas_sigproc_spark.sources.channel import Channel, channels_to_signals

try:  # pragma: no cover - exercised only where endaq is installed
    import endaq.ide as _endaq_ide
except Exception:  # ImportError or transitive dep failures
    _endaq_ide = None


def _builtin_channels(filename: str):
    """Built-in EBML fallback (sources/mide.py): parses real EBML bytes
    for recordings in either built-in profile — the MIDE DocType (the
    genuine recorder layout: struct-format payloads, start/end
    time-code interpolation, modulo-2**24 unwrap, polynomial
    calibration) or the engine's own documented profile.  Returns None
    when the file is neither (then only the endaq package can read
    it)."""
    from pandas_sigproc_spark.sources import mide

    try:
        with open(filename, "rb") as fh:
            buf = fh.read()
    except OSError:
        # the probe could not even open the file — defer to the endaq
        # package path ONLY when that path exists (it reports its own
        # error for package-specific virtual-filesystem handles);
        # without the package the fallthrough would turn a plain
        # FileNotFoundError/PermissionError into a misleading
        # 'install endaq' ImportError
        if _endaq_ide is not None:
            return None
        raise
    if mide.is_mide(buf):
        return mide.read_mide_channels(buf, source=filename)
    if not mide.is_recording(buf):
        return None
    return mide.read_recording_channels(buf, source=filename)


def _require_endaq():
    if _endaq_ide is None:
        raise ImportError(
            "the 'endaq' package is required for full-fidelity .ide "
            "ingest (pip install endaq); recordings in the engine's own "
            "EBML profile (sources/mide.py) are read by the built-in "
            "parser without it"
        )


def _subchannels(doc):
    """Flat (displayName, subchannel) pairs — the reference's enumeration
    order (``daq/io.py:176-184``: outer channels dict, inner subchannels)."""
    for ch in doc.channels.values():
        for sub in ch.subchannels:
            yield sub.displayName, sub


def ide_channel_list(filename: str) -> list[str]:
    """Display names in one ``.ide`` file (reference ``Endaq.channel_list``,
    ``daq/io.py:175-184``)."""
    # profile-first dispatch: a file in one of the BUILT-IN profiles is
    # read by the built-in parser even when the endaq package is
    # installed — endaq cannot parse the engine profile, so the old
    # package-absence gate broke those files the moment endaq appeared
    # on the executors (a review finding)
    chans = _builtin_channels(filename)
    if chans is not None:
        return [c.name for c in chans]
    _require_endaq()
    doc = _endaq_ide.get_doc(filename=filename)
    try:
        return [name for name, _ in _subchannels(doc)]
    finally:
        doc.close()


def _sub_to_channel(filename: str, sub) -> Channel:
    """One subchannel -> Channel, mirroring ``EndaqChannel``'s properties
    (``daq/io.py:241-301``): seconds time base, data vector, displayName,
    units[1], and start_time = min of the UTC datetime index (naive) —
    two reads per subchannel instead of the reference's one per property.
    """
    pdf = _endaq_ide.to_pandas(sub, time_mode="seconds")
    dt_idx = _endaq_ide.to_pandas(sub, time_mode="datetime", tz="utc").index
    start = dt_idx.min()
    if getattr(start, "tzinfo", None) is not None:
        start = start.replace(tzinfo=None)
    return Channel(
        channel_id=f"{filename}:{sub.displayName}",
        time=pdf.index.to_numpy(dtype="float64"),
        # reshape(-1), NOT squeeze(): a single-sample subchannel's
        # (1, 1) frame squeezes to a 0-D array, crashing len()/Arrow
        # downstream (a review finding)
        data=pdf.to_numpy(dtype="float64").reshape(-1),
        name=sub.displayName,
        unit=str(sub.units[1]) if sub.units else "none",
        start_time=start,
    )


def read_ide_channel(filename: str, ch_name: str) -> Channel:
    """Name lookup (reference ``Endaq.get_channel``, ``daq/io.py:211-239``):
    raises KeyError when the display name is absent."""
    chans = _builtin_channels(filename)  # profile-first (see above)
    if chans is not None:
        for c in chans:
            if c.name == ch_name:
                return c
        raise KeyError(f"channel {ch_name!r} not in {filename}")
    _require_endaq()
    doc = _endaq_ide.get_doc(filename=filename)
    try:
        for name, sub in _subchannels(doc):
            if name == ch_name:
                return _sub_to_channel(filename, sub)
    finally:
        doc.close()
    raise KeyError(f"channel {ch_name!r} not in {filename}")


def read_ide_channels(filename: str) -> list[Channel]:
    """Open one ``.ide`` file -> in-memory Channels (every subchannel)."""
    chans = _builtin_channels(filename)  # profile-first (see above)
    if chans is not None:
        return chans
    _require_endaq()
    doc = _endaq_ide.get_doc(filename=filename)
    try:
        return [_sub_to_channel(filename, sub) for _, sub in _subchannels(doc)]
    finally:
        doc.close()


def ingest_ide(spark, filename: str):
    """One ``.ide`` file -> (signals_df, channels_df)."""
    return channels_to_signals(spark, read_ide_channels(filename))


def ingest_ide_dir(spark, filenames: list[str], output_path: str) -> None:
    """Distributed ingest: one task per file, appending canonical parquet.

    Each executor task opens its own file (both readers are pure Python,
    so they run fine in executors) and writes that file's channels
    partitioned by ``channel_id``.  Files in the engine's own EBML
    profile are parsed by the built-in reader; anything else needs the
    ``endaq`` package on the executors (the per-task reader raises a
    clear ImportError otherwise).
    """
    if not filenames:
        # parallelize([], 0) dies in pyspark with an opaque
        # ZeroDivisionError (a review finding) — refuse by name
        raise ValueError("ingest_ide_dir: no input files")

    def one_file(fn: str):
        # plain tuples, one per sample — the old path built a pandas
        # frame only to explode it back into per-row DICTS, which
        # pickle and re-verify per row (a review finding); a
        # zero-channel file yields no rows instead of crashing
        # pd.concat([]) (same class channel.py:40-44 records as fixed)
        for ch in read_ide_channels(fn):
            cid = ch.channel_id
            for t, v in zip(ch.time.tolist(), ch.data.tolist()):
                yield (cid, float(t), float(v))

    rows = spark.sparkContext.parallelize(filenames, len(filenames)).flatMap(one_file)
    df = spark.createDataFrame(rows, "channel_id string, t double, value double")
    df.write.mode("append").partitionBy("channel_id").parquet(output_path)
