"""SubRip (SRT) and WebVTT subtitle parsing in pure stdlib.

The text layer of the video modality — subtitle files are a standing
source of aligned conversational text in crawled corpora.  Implemented
from the PUBLIC formats: SRT's numbered cue blocks with
``HH:MM:SS,mmm --> HH:MM:SS,mmm`` timing lines, and W3C WebVTT's
``WEBVTT`` header, optional cue identifiers, ``HH:MM:SS.mmm`` (dot)
timing with optional settings after the arrow, NOTE comment blocks,
and multi-line cue payloads.

* ``parse_srt`` / ``parse_vtt`` — -> [{'idx', 'start_ms', 'end_ms',
  'text'}] in document order; timing arithmetic validated
  (end > start, minutes/seconds < 60).
* ``build_srt`` / ``build_vtt`` — deterministic writers (the
  synth/oracle vehicle).

Malformed input raises ``ValueError``; cue-count caps bound hostile
files.
"""

from __future__ import annotations

import re

MAX_CUES = 1 << 16

_SRT_TIME = re.compile(
    r"(\d{2,}):([0-5]\d):([0-5]\d),(\d{3})"
    r"\s*-->\s*"
    r"(\d{2,}):([0-5]\d):([0-5]\d),(\d{3})\s*$"
)
_VTT_TIME = re.compile(
    r"(?:(\d{2,}):)?([0-5]\d):([0-5]\d)\.(\d{3})"
    r"\s*-->\s*"
    r"(?:(\d{2,}):)?([0-5]\d):([0-5]\d)\.(\d{3})(?:\s+\S.*)?$"
)


def _ms(h, m, s, ms) -> int:
    return ((int(h or 0) * 60 + int(m)) * 60 + int(s)) * 1000 + int(ms)


def parse_srt(payload: bytes | str) -> list[dict]:
    """SRT bytes/str -> [{'idx', 'start_ms', 'end_ms', 'text'}]."""
    if isinstance(payload, (bytes, bytearray)):
        payload = bytes(payload).decode("utf-8-sig")
    blocks = re.split(r"\r?\n\r?\n+", payload.strip())
    out = []
    for blk in blocks:
        if not blk.strip():
            continue
        if len(out) >= MAX_CUES:
            raise ValueError("SRT cue count exceeds cap")
        lines = blk.splitlines()
        if len(lines) < 2:
            raise ValueError("SRT cue block too short")
        try:
            idx = int(lines[0].strip())
        except ValueError as exc:
            raise ValueError(f"bad SRT cue number {lines[0]!r}") from exc
        m = _SRT_TIME.match(lines[1].strip())
        if m is None:
            raise ValueError(f"bad SRT timing line {lines[1]!r}")
        start = _ms(m.group(1), m.group(2), m.group(3), m.group(4))
        end = _ms(m.group(5), m.group(6), m.group(7), m.group(8))
        if end <= start:
            raise ValueError("SRT cue must end after it starts")
        out.append(
            {
                "idx": idx,
                "start_ms": start,
                "end_ms": end,
                "text": "\n".join(lines[2:]),
            }
        )
    if not out:
        raise ValueError("SRT has no cues")
    return out


def parse_vtt(payload: bytes | str) -> list[dict]:
    """WebVTT bytes/str -> [{'idx' (1-based cue order), 'start_ms',
    'end_ms', 'text'}]; NOTE blocks and cue settings are skipped."""
    if isinstance(payload, (bytes, bytearray)):
        payload = bytes(payload).decode("utf-8-sig")
    s = payload.strip()
    if not s.startswith("WEBVTT"):
        raise ValueError("not a WebVTT file: missing WEBVTT header")
    blocks = re.split(r"\r?\n\r?\n+", s)[1:]  # drop the header block
    out = []
    for blk in blocks:
        lines = blk.splitlines()
        if not lines:
            continue
        if lines[0].startswith("NOTE") or lines[0].startswith("STYLE"):
            continue
        if len(out) >= MAX_CUES:
            raise ValueError("WebVTT cue count exceeds cap")
        ti = 0
        if "-->" not in lines[0]:  # optional cue identifier line
            ti = 1
            if len(lines) < 2 or "-->" not in lines[1]:
                raise ValueError(f"WebVTT cue without timing: {blk[:40]!r}")
        m = _VTT_TIME.match(lines[ti].strip())
        if m is None:
            raise ValueError(f"bad WebVTT timing line {lines[ti]!r}")
        start = _ms(m.group(1), m.group(2), m.group(3), m.group(4))
        end = _ms(m.group(5), m.group(6), m.group(7), m.group(8))
        if end <= start:
            raise ValueError("WebVTT cue must end after it starts")
        out.append(
            {
                "idx": len(out) + 1,
                "start_ms": start,
                "end_ms": end,
                "text": "\n".join(lines[ti + 1 :]),
            }
        )
    if not out:
        raise ValueError("WebVTT has no cues")
    return out


def _fmt(ms: int, sep: str) -> str:
    h, rem = divmod(ms, 3_600_000)
    m, rem = divmod(rem, 60_000)
    s, frac = divmod(rem, 1000)
    return f"{h:02d}:{m:02d}:{s:02d}{sep}{frac:03d}"


def build_srt(cues: list[dict]) -> bytes:
    """[{'start_ms', 'end_ms', 'text'}] -> SRT bytes (1-based cue
    numbers)."""
    blocks = [
        f"{i + 1}\n{_fmt(c['start_ms'], ',')} --> "
        f"{_fmt(c['end_ms'], ',')}\n{c['text']}"
        for i, c in enumerate(cues)
    ]
    return ("\n\n".join(blocks) + "\n").encode("utf-8")


def build_vtt(cues: list[dict], with_ids: bool = False,
              note: str | None = None) -> bytes:
    """[{'start_ms', 'end_ms', 'text'}] -> WebVTT bytes; optional cue
    identifier lines and a leading NOTE block."""
    parts = ["WEBVTT"]
    if note:
        parts.append("NOTE " + note)
    for i, c in enumerate(cues):
        head = f"cue-{i + 1}\n" if with_ids else ""
        parts.append(
            f"{head}{_fmt(c['start_ms'], '.')} --> "
            f"{_fmt(c['end_ms'], '.')}\n{c['text']}"
        )
    return ("\n\n".join(parts) + "\n").encode("utf-8")
