"""TPU-VM cluster orchestration — the capability of
/root/reference/pretrain/tpu_run.py:34-200 (create/health-check/delete a TPU
VM pod via the GCP REST API, push code to every worker, launch training on
all of them), built on stdlib + gcloud/ssh subprocesses instead of
fabric/googleapiclient so it runs in minimal images.

All actions support dry_run=True (print the commands) for testing without a
GCP project.

CAVEAT (validation status): this module is dry-run-tested only
(tests/test_utils.py) — the gcloud/ssh/scp subprocess paths have never
executed against a real GCP project from this environment. Treat the
command construction as reviewed-but-unexercised and smoke-test on a real
project before relying on it for fleet operations.
"""

from __future__ import annotations

import json
import shlex
import subprocess
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional


@dataclass
class TPUCreator:
    name: str
    zone: str = "europe-west4-a"
    project: Optional[str] = None
    accelerator_type: str = "v5litepod-8"
    version: str = "tpu-ubuntu2204-base"
    network: Optional[str] = None
    preemptible: bool = False
    dry_run: bool = False
    _log: List[str] = field(default_factory=list)

    # -- low-level ------------------------------------------------------

    def _run(self, cmd: List[str], check: bool = True) -> str:
        printable = " ".join(shlex.quote(c) for c in cmd)
        self._log.append(printable)
        if self.dry_run:
            print(f"[dry-run] {printable}")
            return ""
        out = subprocess.run(cmd, capture_output=True, text=True)
        if check and out.returncode != 0:
            raise RuntimeError(f"{printable}\n{out.stderr}")
        return out.stdout

    def _gcloud(self, *args: str, check: bool = True) -> str:
        cmd = ["gcloud", "compute", "tpus", "tpu-vm", *args,
               f"--zone={self.zone}"]
        if self.project:
            cmd.append(f"--project={self.project}")
        return self._run(cmd, check=check)

    # -- lifecycle ------------------------------------------------------

    def create(self):
        args = ["create", self.name,
                f"--accelerator-type={self.accelerator_type}",
                f"--version={self.version}"]
        if self.network:
            args.append(f"--network={self.network}")
        if self.preemptible:
            args.append("--preemptible")
        return self._gcloud(*args)

    def describe(self) -> Dict:
        out = self._gcloud("describe", self.name, "--format=json", check=False)
        return json.loads(out) if out else {}

    def wait_until_ready(self, timeout_s: float = 1800, poll_s: float = 30) -> bool:
        """Poll until READY+HEALTHY (tpu_run.py:59-79)."""
        deadline = time.time() + timeout_s
        while time.time() < deadline:
            info = self.describe()
            state = info.get("state", "")
            health = info.get("health", "")
            if state == "READY" and health in ("HEALTHY", ""):
                return True
            if self.dry_run:
                return True
            time.sleep(poll_s)
        return False

    def delete(self):
        return self._gcloud("delete", self.name, "--quiet")

    # -- code push + launch ---------------------------------------------

    def push_code(self, local_dir: str, remote_dir: str = "~/merlot_reserve_tpu"):
        """Sync the framework to every worker (tpu_run.py:118-167).

        scp --recurse copies INTO an existing directory (a second push
        would nest local_dir inside remote_dir and relaunches would run
        stale code), so remove the old tree first — that restores the
        reference's rsync semantics."""
        self.run_on_all_workers(f"rm -rf {remote_dir}", detach=False)
        return self._gcloud(
            "scp", "--recurse", local_dir, f"{self.name}:{remote_dir}",
            "--worker=all")

    def run_on_all_workers(self, command: str, detach: bool = True):
        """Run a command on every worker, optionally detached under nohup
        (the reference used `screen`, tpu_run.py:185-191)."""
        if detach:
            command = f"nohup bash -lc {shlex.quote(command)} > train.log 2>&1 &"
        return self._gcloud("ssh", self.name, f"--command={command}",
                            "--worker=all")

    # Dependency provisioning (the reference's tpu_startup_script.sh:1-16
    # equivalent): pip deps for THIS framework + the TCMALLOC large-alloc
    # report threshold. Run once per fresh TPU-VM before launch_training.
    STARTUP_DEPS = (
        'pip install "jax[tpu]" '
        "-f https://storage.googleapis.com/jax-releases/libtpu_releases.html",
        "pip install --upgrade flax optax orbax-checkpoint chex einops "
        "tokenizers pillow numpy pyyaml requests",
        # optional extras (tracking + cloud IO); failures are non-fatal.
        # Parenthesized: bare `|| true` in the ` && `-joined chain would
        # bind to the WHOLE preceding chain (&&/|| are left-associative,
        # equal precedence) and mask jax/flax install failures too.
        "(pip install --upgrade wandb google-cloud-storage || true)",
        # 32 GiB, matching tpu_startup_script.sh:16. Parenthesized for the
        # same reason as above: a bare `grep || echo` tail would swallow a
        # failed jax/flax install (the || would bind to the whole chain).
        "(grep -q TCMALLOC_LARGE_ALLOC_REPORT_THRESHOLD ~/.bashrc || "
        "echo 'export TCMALLOC_LARGE_ALLOC_REPORT_THRESHOLD=34359738368' "
        ">> ~/.bashrc)",
    )

    def install_dependencies(self):
        """Provision every worker with the framework's runtime deps
        (tpu_startup_script.sh equivalent; reference tpu_run.py:118-167
        rsyncs code then runs its startup script — here push_code +
        install_dependencies are the two halves)."""
        command = " && ".join(self.STARTUP_DEPS)
        return self.run_on_all_workers(command, detach=False)

    def launch_training(self, config: str = "configs/base.yaml",
                        remote_dir: str = "~/merlot_reserve_tpu",
                        extra_args: str = ""):
        cmd = (f"cd {remote_dir} && python scripts/pretrain.py {config} "
               f"-distributed {extra_args}")
        return self.run_on_all_workers(cmd)

    @property
    def issued_commands(self) -> List[str]:
        return list(self._log)
