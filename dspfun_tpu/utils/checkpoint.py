"""Slab-index checkpoint/resume for long video jobs.

The reference has no computation-state persistence; its manual resume
story is --offset/--frames seeking (SURVEY.md section 5).  motion here
adds ``--resume-file <path>``: after each block-depth slab is written
the state file records the slab index, and a rerun with the same flags
seeks input and appends output from the recorded point.
"""

from __future__ import annotations

import json
import os

__all__ = ["load_state", "save_state"]


def load_state(path: str) -> dict:
    if not path or not os.path.exists(path):
        return {}
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return {}


def save_state(path: str, state: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f)
    os.replace(tmp, path)
