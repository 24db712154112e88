"""Prompt grammar: "text:weight" with URL-colon handling.

Same parsing contract as the reference (cgd/script_util.py:60-67): weights
come after the last colon; http(s) URLs keep their scheme colon; missing
weight defaults to 1.0. Multi-prompt strings are '|'-separated at the CLI
layer (cgd/cgd.py:365-373).
"""

from __future__ import annotations

from typing import List, Tuple


def parse_prompt(prompt: str) -> Tuple[str, float]:
    """Split ``"text:weight"`` into (text, weight); weight defaults to 1.

    An http(s) prompt keeps the colon after its scheme: the scheme is peeled
    off first, so only a colon in the *remainder* separates a weight (e.g.
    ``"http://x/a.png:0.5"`` -> ("http://x/a.png", 0.5) but a bare URL stays
    whole). A non-numeric weight raises ValueError, as in the reference.
    """
    if prompt.startswith(("http://", "https://")):
        scheme, rest = prompt.split(":", 1)
        body, sep, tail = rest.rpartition(":")
        return (f"{scheme}:{body}", float(tail)) if sep else (prompt, 1.0)
    body, sep, tail = prompt.rpartition(":")
    return (body, float(tail)) if sep else (prompt, 1.0)


def split_prompts(prompts_arg: str) -> List[str]:
    """CLI '|' splitting (cgd/cgd.py:365-373)."""
    return prompts_arg.split("|") if prompts_arg else []
