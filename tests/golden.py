"""Golden-file comparison helpers: float-tolerant text diff.

Mirrors the reference's roundfloats.pl testing convention: numeric tokens
compare to N significant figures, everything else must match exactly.
"""

from __future__ import annotations

import json
import math
import re

_NUM = re.compile(r"[-+]?\d+\.?\d*(?:[eE][-+]?\d+)?")


def split_tokens(text: str):
    """Yield (is_number, token) across the text."""
    pos = 0
    for m in _NUM.finditer(text):
        if m.start() > pos:
            yield False, text[pos : m.start()]
        yield True, m.group()
        pos = m.end()
    if pos < len(text):
        yield False, text[pos:]


def assert_text_match(got: str, expected: str, sig_figs: int = 4, abs_floor: float = None):
    """Compare texts with numeric tokens matched to sig_figs significant figures."""
    if abs_floor is None:
        abs_floor = 10.0 ** (-sig_figs)
    got_toks = list(split_tokens(got))
    exp_toks = list(split_tokens(expected))
    assert len(got_toks) == len(exp_toks), (
        f"token count mismatch: {len(got_toks)} vs {len(exp_toks)}\n"
        f"got:\n{got}\nexpected:\n{expected}"
    )
    for (gn, gt), (en, et) in zip(got_toks, exp_toks):
        assert gn == en, f"token type mismatch: {gt!r} vs {et!r}"
        if gn:
            if gt == et:  # identical text (also covers inf-parsing name fragments)
                continue
            g, e = float(gt), float(et)
            tol = max(abs(e), abs(g)) * 10.0 ** (1 - sig_figs) / 2 + abs_floor
            assert abs(g - e) <= tol, f"number mismatch: {g} vs {e} (tol {tol})\ngot:\n{got}"
        else:
            assert _norm_ws(gt) == _norm_ws(et), f"text mismatch: {gt!r} vs {et!r}"


def _norm_ws(s: str) -> str:
    return re.sub(r"[ \t]+", " ", s)


def assert_json_close(got, expected, rel: float = 1e-3, atol: float = 1e-6, path: str = "$"):
    """Structural JSON comparison with numeric tolerance."""
    if isinstance(expected, dict):
        assert isinstance(got, dict), f"{path}: {type(got)} vs dict"
        assert set(got) == set(expected), f"{path}: keys {sorted(got)} vs {sorted(expected)}"
        for k in expected:
            assert_json_close(got[k], expected[k], rel, atol, f"{path}.{k}")
    elif isinstance(expected, list):
        assert isinstance(got, list) and len(got) == len(expected), f"{path}: list length"
        for i, (g, e) in enumerate(zip(got, expected)):
            assert_json_close(g, e, rel, atol, f"{path}[{i}]")
    elif isinstance(expected, bool) or expected is None or isinstance(expected, str):
        assert got == expected, f"{path}: {got!r} vs {expected!r}"
    else:
        assert isinstance(got, (int, float)), f"{path}: {got!r} vs number"
        assert math.isclose(float(got), float(expected), rel_tol=rel, abs_tol=atol), (
            f"{path}: {got} vs {expected}"
        )


def load_lenient_json(text: str):
    """json.loads tolerating the reference's missing-comma quirk."""
    try:
        return json.loads(text)
    except json.JSONDecodeError:
        fixed = re.sub(r'(:\s*[-+0-9.eE]+)(\s*\n\s*")', r"\1,\2", text)
        return json.loads(fixed)
