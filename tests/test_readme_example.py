"""Execute the README quick-start verbatim so the public API can't rot.

The code block is extracted from README.md at collection time; the only
edits are size substitutions (mesh 64->16, 1024->8 samples, 200->2
epochs, shrunk randomized-solver ranks), each of which must match
exactly once — editing the README without updating this test (or vice
versa) fails loudly.

Reference analog: the hIPPYflow README example
(`/root/reference/README.md:85-160`) is the canonical smoke test of the
public surface; hippyflow has no automated test of it.
"""

import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _params(factory, **kw):
    p = factory()
    for k, v in kw.items():
        p[k] = v
    return p


# (pattern, replacement) pairs; each must hit exactly once.
_SUBS = [
    ("hf.unit_square_mesh(64)", "hf.unit_square_mesh(16)"),
    # shrink the randomized-eigensolver ranks to the toy problem's size
    (
        "AS = hf.ActiveSubspaceProjector(observable, prior)",
        "AS = hf.ActiveSubspaceProjector(observable, prior, "
        "parameters=_params(hf.ActiveSubspaceParameterList, "
        "rank=24, oversampling=4, samples_per_process=8))",
    ),
    (
        'hf.KLEProjector(prior).construct_input_subspace("mass")',
        "hf.KLEProjector(prior, parameters=_params(hf.KLEParameterList, "
        'rank=24)).construct_input_subspace("mass")',
    ),
    (
        "hf.PODProjector(observable, prior).construct_subspace()",
        "hf.PODProjector(observable, prior, "
        "parameters=_params(hf.PODParameterList, rank=24, "
        "sample_per_process=8)).construct_subspace()",
    ),
    (
        "generate(\n    1024, derivatives=(1, 0)",
        "generate(\n    8, derivatives=(1, 0)",
    ),
    ("epochs=200", "epochs=2"),
    ("[:, :32]", "[:, :8]"),
    ("[:, :16]", "[:, :8]"),
]


def _readme_block():
    with open(os.path.join(REPO, "README.md")) as f:
        text = f.read()
    m = re.search(r"## Quick start\n\n```python\n(.*?)```", text, re.S)
    assert m, "README quick-start python block not found"
    return m.group(1)


@pytest.mark.slow
def test_readme_quickstart(tmp_path, monkeypatch):
    code = _readme_block()
    for pat, rep in _SUBS:
        n = code.count(pat)
        assert n == 1, f"README drifted: {pat!r} matched {n} times (expected 1)"
        code = code.replace(pat, rep)
    monkeypatch.chdir(tmp_path)
    ns: dict = {"_params": _params}
    exec(compile(code, "README.md#quickstart", "exec"), ns)
    # sanity on what the block computed
    import numpy as np

    d_GN = np.asarray(ns["d_GN"])
    assert np.all(d_GN[:-1] >= d_GN[1:] - 1e-12), "AS spectrum not sorted"
    assert os.path.exists("data/mq_data.npz")
    assert np.isfinite(float(ns["logger"]["loss"][-1]))
