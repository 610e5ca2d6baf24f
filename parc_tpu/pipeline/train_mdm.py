"""MDM training driver (parc_1 stage).

Dataset -> feature statistics -> jitted diffusion training loop with EMA,
checkpoints, and periodic validation losses.

Reference parity: parc_1_train_gen.py:13-98 + diffusion/mdm.py:1238-1335.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import numpy as np
import jax

from parc_tpu.anim import motion_lib as ml
from parc_tpu.diffusion.mdm import MDM, MDMState
from parc_tpu.utils import checkpoint as ckpt_lib
from parc_tpu.utils import profiling
from parc_tpu.utils.logger import Logger


@dataclasses.dataclass
class MDMTrainerConfig:
    epochs: int = 100000
    iters_per_epoch: int = 50
    epochs_per_checkpoint: int = 2500
    epochs_per_output: int = 10
    output_dir: str = "output/mdm"
    use_wandb: bool = False
    # XLA profiler: capture epochs [profile_start, profile_start +
    # profile_epochs) into <output_dir>/profile
    profile_epochs: int = 0
    profile_start: int = 2


def train(mdm: MDM, lib: ml.MotionLib,
          cfg: MDMTrainerConfig = MDMTrainerConfig(),
          state: Optional[MDMState] = None, seed: int = 0,
          max_epochs: Optional[int] = None) -> MDMState:
    logger = Logger(output_file=f"{cfg.output_dir}/log.tsv",
                    use_wandb=cfg.use_wandb)
    start_epoch = 0
    if state is None:
        state = mdm.init(lib, jax.random.PRNGKey(seed))
        start = ckpt_lib.latest_step(f"{cfg.output_dir}/checkpoints")
        if start is not None:
            state = ckpt_lib.restore(f"{cfg.output_dir}/checkpoints", state)
            # resume epoch numbering where the checkpoint left off so the
            # retained-checkpoint history keeps accumulating distinct steps
            start_epoch = start
            print(f"resumed MDM from checkpoint epoch {start}")

    def epoch_fn(lib_, state):
        def body(s, _):
            s, metrics = mdm.train_step(lib_, s)
            return s, metrics["total"]
        return jax.lax.scan(body, state, None, length=cfg.iters_per_epoch)

    # lib is a jit argument (never a closure) to keep remote lowering fast
    epoch_jit = jax.jit(epoch_fn)
    lib = jax.device_put(lib)

    t_start = time.time()
    # max_epochs is a TOTAL target: re-invoking a finished run is a
    # no-op and a crashed run completes to the target instead of adding
    # another full budget on top of the resume point (ADVICE r4)
    epochs = cfg.epochs if max_epochs is None else max_epochs
    epochs = max(start_epoch, epochs)
    for epoch in range(start_epoch, epochs):
        if cfg.profile_epochs and epoch == cfg.profile_start:
            jax.profiler.start_trace(f"{cfg.output_dir}/profile")
        t0 = time.time()
        state, totals = epoch_jit(lib, state)
        profiling.sync(totals)
        if (cfg.profile_epochs
                and epoch + 1 == cfg.profile_start + cfg.profile_epochs):
            jax.profiler.stop_trace()
            print(f"profile trace written to {cfg.output_dir}/profile")
        if epoch % cfg.epochs_per_output == 0:
            logger.log("Epoch", epoch)
            logger.log("Step", int(state.step))
            logger.log("Loss", float(np.mean(np.asarray(totals))))
            logger.log("Wall_Time", (time.time() - t_start) / 3600.0)
            logger.log("Samples_Per_Sec",
                       cfg.iters_per_epoch * mdm.cfg.batch_size
                       / (time.time() - t0))
            logger.end_iter()
        if (epoch + 1) % cfg.epochs_per_checkpoint == 0:
            ckpt_lib.save(f"{cfg.output_dir}/checkpoints", epoch + 1, state)

    # final checkpoint so kin-gen always finds a model even when training
    # stopped between checkpoint intervals
    if epochs != start_epoch and epochs % cfg.epochs_per_checkpoint != 0:
        ckpt_lib.save(f"{cfg.output_dir}/checkpoints", epochs, state)
    return state
