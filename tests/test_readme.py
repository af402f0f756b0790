"""Execute the README's python code blocks so the front-page examples
can never rot. Blocks are extracted verbatim; the quick-start runs at
a reduced epoch count (patched textually) to keep CI fast."""

import re
from pathlib import Path

README = Path(__file__).parent.parent / "README.md"


def _code_blocks(text):
    return re.findall(r"```python\n(.*?)```", text, flags=re.DOTALL)


def test_readme_quickstart_runs(tmp_path, monkeypatch):
    blocks = _code_blocks(README.read_text())
    assert blocks, "README lost its python quick-start block"
    code = blocks[0]
    assert "MAPDeconvolver" in code
    # keep the executed example fast but otherwise verbatim
    code = code.replace("n_epochs=500", "n_epochs=5")
    assert "n_epochs=5" in code
    monkeypatch.chdir(tmp_path)  # result.write lands in tmp
    namespace = {}
    exec(compile(code, str(README), "exec"), namespace)  # noqa: S102
    result = namespace["result"]
    assert (tmp_path / "result.fits").exists()
    assert result.flux_upsampled_total.shape == (64, 64)
