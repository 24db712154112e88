"""Prompt grammar: "text:weight" with URL-colon handling.

Same parsing contract as the reference (cgd/script_util.py:60-67): weights
come after the last colon; http(s) URLs keep their scheme colon; missing
weight defaults to 1.0. Multi-prompt strings are '|'-separated at the CLI
layer (cgd/cgd.py:365-373).
"""

from __future__ import annotations

from typing import List, Tuple


def parse_prompt(prompt: str) -> Tuple[str, float]:
    if prompt.startswith("http://") or prompt.startswith("https://"):
        vals = prompt.rsplit(":", 2)
        vals = [vals[0] + ":" + vals[1], *vals[2:]]
    else:
        vals = prompt.rsplit(":", 1)
    vals = vals + ["", "1"][len(vals):]
    return vals[0], float(vals[1])


def split_prompts(prompts_arg: str) -> List[str]:
    """CLI '|' splitting (cgd/cgd.py:365-373)."""
    return prompts_arg.split("|") if prompts_arg else []
