"""Results-folder guard (phenaki_tpu/utils/results_folder.py).

Reference cvivit_trainer.py:44-46,171-174 asks y/n before reusing a
non-empty results folder; our version must stay non-destructive and
non-blocking in non-interactive runs while keeping the explicit knob.
"""

from pathlib import Path

from phenaki_tpu.utils.results_folder import prepare_results_folder


def _seed(tmp_path: Path) -> Path:
    folder = tmp_path / "results"
    folder.mkdir()
    (folder / "old_checkpoint.bin").write_bytes(b"x" * 16)
    return folder


def test_keeps_previous_results_by_default_non_interactive(tmp_path):
    folder = _seed(tmp_path)
    out = prepare_results_folder(folder)  # stdin is not a TTY under pytest
    assert out == folder
    assert (folder / "old_checkpoint.bin").exists(), (
        "non-interactive runs must never destroy previous results unprompted"
    )


def test_clear_previous_true_removes_contents(tmp_path):
    folder = _seed(tmp_path)
    out = prepare_results_folder(folder, clear_previous=True)
    assert out.exists() and not (folder / "old_checkpoint.bin").exists()


def test_clear_previous_false_keeps_contents(tmp_path):
    folder = _seed(tmp_path)
    prepare_results_folder(folder, clear_previous=False)
    assert (folder / "old_checkpoint.bin").exists()


def test_creates_missing_folder(tmp_path):
    folder = tmp_path / "brand_new" / "nested"
    out = prepare_results_folder(folder)
    assert out.is_dir()


def test_interactive_prompt_yes_clears(tmp_path, monkeypatch):
    import phenaki_tpu.utils.results_folder as rf

    folder = _seed(tmp_path)
    monkeypatch.setattr(rf.sys.stdin, "isatty", lambda: True, raising=False)
    monkeypatch.setattr("builtins.input", lambda _: "y")
    prepare_results_folder(folder)
    assert not (folder / "old_checkpoint.bin").exists()


def test_interactive_prompt_no_keeps(tmp_path, monkeypatch):
    import phenaki_tpu.utils.results_folder as rf

    folder = _seed(tmp_path)
    monkeypatch.setattr(rf.sys.stdin, "isatty", lambda: True, raising=False)
    monkeypatch.setattr("builtins.input", lambda _: "n")
    prepare_results_folder(folder)
    assert (folder / "old_checkpoint.bin").exists()


def test_trainer_threads_the_knob(tmp_path):
    """CViViTTrainer(clear_previous_results=True) clears a stale folder."""
    import inspect

    from phenaki_tpu.training.cvivit_trainer import CViViTTrainer
    from phenaki_tpu.training.phenaki_trainer import PhenakiTrainer

    assert "clear_previous_results" in inspect.signature(
        CViViTTrainer.__init__
    ).parameters
    assert "clear_previous_results" in inspect.signature(
        PhenakiTrainer.__init__
    ).parameters
