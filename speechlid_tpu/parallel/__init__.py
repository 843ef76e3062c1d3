"""Mesh construction + sharded training transforms (reference: the DDP
machinery in ccml/trainer.py:358-437 — see SURVEY.md §2.5 for the mapping).
"""

from speechlid_tpu.parallel.mesh import (
    make_mesh,
    replicate,
    shard_batch,
)
from speechlid_tpu.parallel.pipeline import (
    pipeline_apply,
    pipeline_bubble_fraction,
    shard_time,
    split_microbatches,
    stack_stage_params,
)
from speechlid_tpu.parallel.sharding import (
    CONFORMER_TP_RULES,
    EP_RULES,
    WAVLM_TP_RULES,
    describe_shardings,
    make_param_sharder,
)
