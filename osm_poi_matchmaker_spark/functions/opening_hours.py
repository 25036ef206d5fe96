# -*- coding: utf-8 -*-
"""OSM ``opening_hours`` compiler — 31 scalar fields → one spec string.

Reimplements the semantics of the reference's ``OpeningHours`` class
(``libs/opening_hours.py:17-155``; golden table
``test/test_opening_hours_data.py`` ported to tests/test_opening_hours.py):

- group weekdays by identical (open, close), keeping first-weekday order;
- consecutive-day runs render as ``Mo-We``, ragged sets as ``Mo,We,Su``;
- ``open == close`` means closed (row dropped);
- optional lunch break splits every interval ``o-lbs,lbe-c``;
- public holidays append ``; PH open`` / ``; PH off``;
- non-stop or a ``Mo-Su 00:00-24:00`` result collapses to ``24/7``.

No pandas dependency (the reference builds a 7×5 DataFrame per record —
pure dict grouping is equivalent and batch-friendly inside a pandas UDF).
"""

from __future__ import annotations

WEEKDAYS = ("mo", "tu", "we", "th", "fr", "sa", "su")


def compile_opening_hours(
    non_stop,
    opens,  # 7 values mo..su
    closes,  # 7 values mo..su
    lunch_break_start=None,
    lunch_break_stop=None,
    public_holiday_open=None,
) -> str | None:
    """Compile one record's weekly hours into an opening_hours string."""
    if public_holiday_open is True:
        ph = "; PH open"
    elif public_holiday_open is False:
        ph = "; PH off"
    else:
        ph = ""

    # group days by (open, close), preserving first-occurrence day order
    groups: dict[tuple, list[int]] = {}
    for day_idx in range(7):
        key = (opens[day_idx], closes[day_idx])
        groups.setdefault(key, []).append(day_idx)

    rendered = []
    saw_valid_row = False
    for (o, c), day_ids in groups.items():
        if o is None or c is None:
            continue
        saw_valid_row = True
        if len(day_ids) >= 2 and all(
            day_ids[i + 1] - day_ids[i] == 1 for i in range(len(day_ids) - 1)
        ):
            days = f"{WEEKDAYS[day_ids[0]]}-{WEEKDAYS[day_ids[-1]]}"
        else:
            days = ",".join(WEEKDAYS[i] for i in day_ids)
        if o != c:
            if lunch_break_start is None and lunch_break_stop is None:
                rendered.append(f"{days.title()} {o}-{c}")
            else:
                rendered.append(
                    f"{days.title()} {o}-{lunch_break_start},{lunch_break_stop}-{c}"
                )

    spec = "; ".join(rendered)
    if saw_valid_row:
        spec = spec + ph
    if non_stop is True or "Mo-Su 00:00-24:00" in spec:
        # PH suffix only reachable when a weekday row rendered it (the
        # reference's oh_ph is loop-local; no valid row → bare '24/7').
        return f"24/7{ph}" if saw_valid_row else "24/7"
    if not rendered:
        return None
    return spec
