"""Results-folder guard (reference cvivit_trainer.py:44-46,171-174).

The reference asks y/n before reusing a non-empty results folder ("do you
want to clear previous experiment checkpoints and results?") and `rmtree`s
it on yes. This helper preserves that behavior while staying safe for
non-interactive runs (CI, cron, multi-host): the prompt only fires on an
attached TTY on process 0; everywhere else the default is to KEEP existing
files (never block, never destroy unprompted).
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path
from typing import Optional


def yes_or_no(question: str) -> bool:
    answer = input(f"{question} (y/n) ")
    return answer.lower() in ("yes", "y")


def prepare_results_folder(
    path, clear_previous: Optional[bool] = None
) -> Path:
    """Create `path`, optionally clearing a previous experiment first.

    clear_previous:
      * True  — remove existing contents unconditionally.
      * False — keep existing contents.
      * None  — reference behavior when interactive (y/n prompt on a TTY,
        process 0 only); keep contents when non-interactive.
    """
    folder = Path(path)
    has_previous = folder.exists() and any(folder.iterdir())
    if has_previous:
        if clear_previous is None:
            import jax

            interactive = sys.stdin is not None and sys.stdin.isatty()
            if interactive and jax.process_index() == 0:
                clear_previous = yes_or_no(
                    "do you want to clear previous experiment checkpoints and results?"
                )
            else:
                clear_previous = False
        if clear_previous:
            shutil.rmtree(folder)
    folder.mkdir(parents=True, exist_ok=True)
    return folder
