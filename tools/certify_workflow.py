"""One-session certification of the complete 10-model reference workflow.

The reference's defining artifact is ALL TEN models through
train -> finetune -> eval -> CSV -> summary (utils/trainer.py:163-211 ->
tester.py:513 -> results/*.csv).  This drives that exact surface through the
REAL CLI (subprocesses, the user's entry point) on synthetic data at tiny
epochs, recording per-command wall time, and verifies:

  - `medseg train` over all 8 CNN models (two-stage recipe incl. the
    stage-1->2 transition at --epochs 6) writes 8 best checkpoints,
  - `medseg finetune-clip --random-init` / `finetune-clipseg --random-init`
    write the 2 HF-family checkpoints (offline stand-in towers — real scale,
    random weights; the recipe/checkpoint format is the pretrained path's),
  - `medseg eval` loads ALL TEN from the framework's own checkpoints alone
    and emits both reference-schema CSVs + the summary with no skips.

Output: CERT_WORKFLOW.json in the CWD + a human-readable transcript on
stdout.  Run on TPU with nohup (never timeout-kill a mid-flight jax
process):

    nohup python tools/certify_workflow.py > /tmp/cert.log 2>&1 &

Environment knobs: CERT_DIR (workdir, default a fresh temp dir),
CERT_EPOCHS (default 6 — crosses the cls stage boundary), CERT_SCAN (pass
--scan-chunk K to train).
"""
import csv
import json
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, ".")

MODELS_8 = ["ResNet50", "ResNet18", "VGG16", "VGG19",
            "ResNetUnet", "AttentionUNet", "R2Unet", "R2AttUnet"]


def build_synthetic_caches(cache_dir: str, img: int):
    """Packed caches in the production format (what `medseg pack` writes),
    synthesized at the production 256 grid (CERT_IMG shrinks it for CPU
    smoke runs of this tool itself)."""
    from medseg_tpu.data.packed import save_packed
    from medseg_tpu.data.synthetic import synthetic_cls, synthetic_seg

    save_packed(synthetic_cls(n=64, img_size=img, seed=0), cache_dir, "train_cls")
    save_packed(synthetic_seg(n=32, img_size=img, seed=1), cache_dir, "train_seg")
    save_packed(synthetic_cls(n=16, img_size=img, seed=2), cache_dir, "test_cls")
    save_packed(synthetic_seg(n=16, img_size=img, seed=3), cache_dir, "test_seg")


def run_cmd(argv, log_path: Path):
    t0 = time.time()
    with open(log_path, "w") as f:
        rc = subprocess.call([sys.executable, "-m", "medseg_tpu.apps.cli"]
                             + argv, stdout=f, stderr=subprocess.STDOUT)
    dt = time.time() - t0
    tail = log_path.read_text().splitlines()[-25:]
    return rc, dt, tail


def acquire_workdir_lock(work: Path):
    """Refuse to run two sweeps over one workdir.  Two concurrent runs race
    each other's orbax OCDBT checkpoint directories (observed: NOT_FOUND
    lock-rename failures mid-save) and share the chip — an accidental
    double nohup launch produced exactly that in r5.  flock is held for
    the process lifetime and released by the OS on any exit."""
    import fcntl
    lock_path = work / ".cert.lock"
    fd = os.open(lock_path, os.O_CREAT | os.O_RDWR)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
    except OSError:
        sys.exit(f"[cert] ABORT: another certify_workflow run holds "
                 f"{lock_path} — refusing to race one workdir")
    return fd  # keep open; closing would drop the lock


def main():
    work = os.environ.get("CERT_DIR") or tempfile.mkdtemp(prefix="cert_")
    epochs = os.environ.get("CERT_EPOCHS", "6")
    scan = os.environ.get("CERT_SCAN", "")
    work = Path(work)
    cache = str(work / "packed")
    weights = str(work / "weights")
    results = str(work / "results")
    logs = work / "logs"
    logs.mkdir(parents=True, exist_ok=True)
    _lock_fd = acquire_workdir_lock(work)  # noqa: F841 — held for process life

    img = int(os.environ.get("CERT_IMG", "256"))
    print(f"[cert] workdir {work}", flush=True)
    build_synthetic_caches(cache, img)
    print(f"[cert] synthetic packed caches built ({img}px, production format)",
          flush=True)

    report = {"workdir": str(work), "epochs": int(epochs), "commands": {},
              "ok": True}

    def step(key, argv):
        rc, dt, tail = run_cmd(argv, logs / f"{key}.log")
        report["commands"][key] = {"rc": rc, "wall_s": round(dt, 1),
                                   "tail": tail[-6:]}
        status = "ok" if rc == 0 else f"FAILED rc={rc}"
        print(f"[cert] {key}: {status} in {dt:.0f}s", flush=True)
        if rc != 0:
            report["ok"] = False
            for ln in tail:
                print(f"    {ln}", flush=True)
        return rc == 0

    common = ["--cache-dir", cache, "--weights-root", weights,
              "--results-dir", results]
    scan_args = ["--scan-chunk", scan] if scan else []

    # --- train all 8 CNN models, one process per model (wall time is
    # per-model evidence; a crash in one cannot hide the others) ----------
    for name in MODELS_8:
        step(f"train_{name}",
             ["train", name, "--epochs", epochs, *common, *scan_args])

    # --- the two HF-family finetunes (offline random-init stand-ins) -----
    step("finetune_clip",
         ["finetune-clip", "--random-init", "--epochs", "2",
          "--batch-size", "16", *common, *scan_args])
    step("finetune_clipseg",
         ["finetune-clipseg", "--random-init", "--epochs", "2",
          "--batch-size", "8", *common, *scan_args])

    # --- eval all 10 from the framework's own checkpoints ----------------
    step("eval", ["eval", *common])

    # --- verify the artifact surface --------------------------------------
    eval_log = (logs / "eval.log").read_text() if (logs / "eval.log").exists() else ""
    skips = [ln for ln in eval_log.splitlines() if "Skipping" in ln]
    report["eval_skipped_models"] = skips
    if skips:
        report["ok"] = False
        print(f"[cert] EVAL SKIPPED MODELS: {skips}", flush=True)

    rows = {}
    for fname, expect in (("classification_test_results.csv", 5),
                          ("segmentation_test_results.csv", 5)):
        path = Path(results) / fname
        n = 0
        if path.exists():
            with open(path) as f:
                n = sum(1 for _ in csv.DictReader(f))
        rows[fname] = n
        if n != expect:
            report["ok"] = False
            print(f"[cert] {fname}: {n} rows (expected {expect})", flush=True)
    report["csv_rows"] = rows
    # the summary block is the reference's observable surface — keep it
    # verbatim in the report
    summary_start = eval_log.find("FINAL TEST RESULTS SUMMARY")
    if summary_start == -1:
        summary_start = eval_log.find("SUMMARY")
    report["eval_summary"] = eval_log[summary_start:][:4000] if summary_start >= 0 else ""

    with open("CERT_WORKFLOW.json", "w") as f:
        json.dump(report, f, indent=1)
    print(f"[cert] {'PASS' if report['ok'] else 'FAIL'} — "
          f"report in CERT_WORKFLOW.json", flush=True)
    sys.exit(0 if report["ok"] else 1)


if __name__ == "__main__":
    main()
