"""functions/ics.py — iCalendar parsing contract (RFC 5545; exact
integer duration math, no timezone guessing)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_engineering_assignment_spark.functions.ics import (
    build_ics,
    parse_duration,
    parse_ics,
)


def test_event_roundtrip_and_dtstart_dtend_duration():
    r = parse_ics(
        build_ics(
            [
                {
                    "uid": "e1@x", "summary": "standup",
                    "dtstart": "20260105T120000Z",
                    "dtend": "20260105T124530Z",
                    "attendees": 3,
                },
            ],
            todos=2,
        )
    )
    assert (r["n_events"], r["n_todos"], r["n_journals"]) == (1, 2, 0)
    assert r["prodid"] == "-//fixture//EN"
    e = r["events"][0]
    assert e["uid"] == "e1@x" and e["summary"] == "standup"
    assert e["duration_s"] == 45 * 60 + 30
    assert e["n_attendees"] == 3 and not e["recurring"]


def test_duration_across_midnight_and_days():
    # day-number arithmetic, not datetime: spans midnight and a month
    r = parse_ics(
        build_ics(
            [{"dtstart": "20260131T230000Z", "dtend": "20260201T010000Z"}]
        )
    )
    assert r["events"][0]["duration_s"] == 7200
    # leap-year February (2024)
    r2 = parse_ics(
        build_ics(
            [{"dtstart": "20240228T000000Z", "dtend": "20240301T000000Z"}]
        )
    )
    assert r2["events"][0]["duration_s"] == 2 * 86400


def test_duration_property_and_grammar():
    r = parse_ics(
        build_ics([{"dtstart": "20260105T120000Z", "duration_s": 5430}])
    )
    assert r["events"][0]["duration_s"] == 5430
    assert parse_duration("P1W") == 604800
    assert parse_duration("P1DT2H3M4S") == 93784
    assert parse_duration("-PT15M") == -900
    with pytest.raises(ValueError, match="DURATION"):
        parse_duration("P")
    with pytest.raises(ValueError, match="DURATION"):
        parse_duration("1H")


def test_mixed_utcness_yields_no_duration():
    # floating local vs Z: never guess timezone math
    r = parse_ics(
        build_ics(
            [{"dtstart": "20260105T120000", "dtend": "20260105T130000Z"}]
        )
    )
    assert r["events"][0]["duration_s"] is None
    # both floating is fine
    r2 = parse_ics(
        build_ics(
            [{"dtstart": "20260105T120000", "dtend": "20260105T130000"}]
        )
    )
    assert r2["events"][0]["duration_s"] == 3600


def test_line_folding_and_text_escapes():
    long = "planning: " + "agenda item, " * 10
    raw = build_ics([{"summary": long, "dtstart": "20260105T120000Z"}])
    # the builder folded it
    assert any(ln.startswith(" ") for ln in raw.split("\r\n"))
    assert parse_ics(raw)["events"][0]["summary"] == long
    r = parse_ics(
        "BEGIN:VCALENDAR\nBEGIN:VEVENT\n"
        "SUMMARY:a\\, b\\; c\\nnewline\\\\slash\n"
        "END:VEVENT\nEND:VCALENDAR\n"
    )
    assert r["events"][0]["summary"] == "a, b; c\nnewline\\slash"


def test_recurrence_and_all_day():
    r = parse_ics(
        build_ics([{"dtstart": "20260105T120000Z", "rrule": True}])
    )
    assert r["events"][0]["recurring"]
    r2 = parse_ics(
        "BEGIN:VCALENDAR\nBEGIN:VEVENT\n"
        "DTSTART;VALUE=DATE:20260105\nEND:VEVENT\nEND:VCALENDAR\n"
    )
    e = r2["events"][0]
    assert e["all_day"] and e["duration_s"] is None


def test_guards():
    with pytest.raises(ValueError, match="VCALENDAR envelope"):
        parse_ics("not a calendar")
    with pytest.raises(ValueError, match="not UTF-8"):
        parse_ics(b"\xff\xfe broken \x80")
    with pytest.raises(ValueError, match="unterminated"):
        parse_ics("BEGIN:VCALENDAR\nBEGIN:VEVENT\nSUMMARY:x\n")
    with pytest.raises(ValueError, match="does not match"):
        parse_ics("BEGIN:VCALENDAR\nBEGIN:VEVENT\nEND:VTODO\n")
    with pytest.raises(ValueError, match="after END"):
        parse_ics("BEGIN:VCALENDAR\nEND:VCALENDAR\nSUMMARY:stray\n")
    with pytest.raises(ValueError, match="out-of-range"):
        parse_ics(
            build_ics([{"dtstart": "20261305T120000Z",
                        "dtend": "20261305T130000Z"}])
        )


@settings(max_examples=150, deadline=None)
@given(
    mutations=st.lists(
        st.tuples(st.integers(0, 300), st.integers(0, 255)),
        min_size=1, max_size=6,
    ),
)
def test_mutation_contract(mutations):
    base = bytearray(
        build_ics(
            [
                {"uid": "u@x", "summary": "s, t; u",
                 "dtstart": "20260105T120000Z",
                 "dtend": "20260105T130000Z", "rrule": True,
                 "attendees": 2},
            ],
            todos=1,
        ).encode()
    )
    for pos, val in mutations:
        base[pos % len(base)] = val
    try:
        r = parse_ics(bytes(base))
        assert isinstance(r, dict)
    except ValueError:
        pass
