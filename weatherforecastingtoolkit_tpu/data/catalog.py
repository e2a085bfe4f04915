"""SEVIR catalog parsing and event grouping.

Behavior parity with the reference's `_compute_samples`
(reference pipeline/datasets/sevir/sevir.py:273-302): filter the CATALOG.csv
to events where every requested img_type is colocated and non-missing, drop
events with duplicated rows (an upstream SEVIR data bug), and produce one
record per event holding per-type (file_name, file_index).
"""

from __future__ import annotations

import datetime
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence, Union

import numpy as np
import pandas as pd

from .constants import SEVIR_DATA_TYPES


@dataclass
class EventRecord:
    event_id: str
    files: Dict[str, str] = field(default_factory=dict)    # img_type -> file_name
    indices: Dict[str, Union[int, str]] = field(default_factory=dict)
    # img_type -> file_index (int) or, for 'lght', the event id string key
    time_utc: Optional[datetime.datetime] = None


class EventIndex:
    """Ordered collection of colocated SEVIR events."""

    def __init__(self, events: List[EventRecord], data_types: Sequence[str]):
        self.events = events
        self.data_types = tuple(data_types)

    def __len__(self) -> int:
        return len(self.events)

    def __getitem__(self, i: int) -> EventRecord:
        return self.events[i]

    def shuffled(self, seed: int) -> "EventIndex":
        order = np.random.default_rng(seed).permutation(len(self.events))
        return EventIndex([self.events[i] for i in order], self.data_types)

    def subset(self, start: int, end: int) -> "EventIndex":
        return EventIndex(self.events[start:end], self.data_types)

    @property
    def filenames(self) -> List[str]:
        seen, out = set(), []
        for ev in self.events:
            for fn in ev.files.values():
                if fn not in seen:
                    seen.add(fn)
                    out.append(fn)
        return out


def load_catalog(path_or_df: Union[str, pd.DataFrame]) -> pd.DataFrame:
    if isinstance(path_or_df, pd.DataFrame):
        return path_or_df
    return pd.read_csv(path_or_df, parse_dates=["time_utc"], low_memory=False)


def build_event_index(
    catalog: Union[str, pd.DataFrame],
    data_types: Optional[Sequence[str]] = None,
    start_date: Optional[datetime.datetime] = None,
    end_date: Optional[datetime.datetime] = None,
    datetime_filter: Optional[Callable] = None,
    catalog_filter: Union[str, Callable, None] = "default",
) -> EventIndex:
    """Filter the catalog and group colocated img_types per event id.

    Date semantics match the reference (sevir/sevir.py:257-267):
    keep rows with time_utc > start_date and time_utc <= end_date;
    'default' catalog filter keeps pct_missing == 0.
    """
    df = load_catalog(catalog)
    data_types = tuple(data_types) if data_types else SEVIR_DATA_TYPES
    if not set(data_types).issubset(SEVIR_DATA_TYPES):
        raise ValueError(f"Unknown data types: {data_types}")

    if start_date is not None:
        df = df[df.time_utc > start_date]
    if end_date is not None:
        df = df[df.time_utc <= end_date]
    if datetime_filter is not None:
        df = df[datetime_filter(df.time_utc)]
    if catalog_filter is not None:
        if catalog_filter == "default":
            catalog_filter = lambda c: c.pct_missing == 0  # noqa: E731
        df = df[catalog_filter(df)]

    wanted = set(data_types)
    df = df[df.img_type.isin(wanted)]

    events: List[EventRecord] = []
    for event_id, group in df.groupby("id", sort=False):
        types_present = set(group.img_type)
        if not wanted.issubset(types_present):
            continue  # missing a requested type
        if len(group) != len(data_types):
            continue  # duplicated rows: upstream data bug, drop whole event
        rec = EventRecord(event_id=str(event_id),
                          time_utc=group.time_utc.iloc[0].to_pydatetime()
                          if "time_utc" in group else None)
        by_type = group.set_index("img_type")
        for t in data_types:
            row = by_type.loc[t]
            rec.files[t] = str(row.file_name)
            rec.indices[t] = str(event_id) if t == "lght" else int(row.file_index)
        events.append(rec)
    return EventIndex(events, data_types)
