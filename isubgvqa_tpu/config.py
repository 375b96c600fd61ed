"""Framework configuration.

One frozen dataclass replaces the reference's argparse surface
(``utils/arg_parser.py:4-137``) and its vestigial JSON config
(``utils/config.py:6-13``); :mod:`isubgvqa_tpu.cli` maps the same
command-line flags onto it, so reference invocations carry over.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional, Tuple, Union


@dataclasses.dataclass(frozen=True)
class Config:
    # ---- model (defaults follow arg_parser.py / isubgvqa.py) ----
    mgat_layers: int = 4                    # --mgat_layers (arg_parser.py:13)
    general_hidden_dim: int = 300           # --general_hidden_dim (:107)
    text_emb_dim: int = 512                 # isubgvqa.py:117
    num_answers: int = 1842                 # isubgvqa.py:207 (hard-coded)
    encoder_layers: int = 4                 # isubgvqa.py:132
    decoder_layers: int = 3                 # isubgvqa.py:155
    num_heads: int = 8                      # isubgvqa.py:130
    gat_heads: int = 4                      # mgat.py:14
    dropout: float = 0.1                    # isubgvqa.py:133
    # the reference hard-codes these two rates; configurable here so
    # deterministic trajectory tests can zero them (defaults = parity)
    head_dropout: float = 0.2               # fusion MLP (isubgvqa.py:206)
    mask_dropout: float = 0.2               # gate scores (masking.py:159,196)
    mgat_masks: Tuple[float, ...] = (1.0, 1.0, 1.0, 0.15)  # arg_parser.py:95-97
    use_instruction: bool = True            # --use_instruction (:92)
    use_masking: bool = True                # --use_masking (:93)
    use_topk: bool = True                   # --use_topk (:98)
    interpretable_mode: bool = False        # --interpretable_mode (:99)
    concat_instr: bool = False              # --concat_instr (:102)
    use_all_instrs: bool = False            # --use_all_instrs (:108)
    use_global_mask: bool = False           # --use_global_mask (:109)
    text_sampling: bool = False             # --text_sampling (:113)
    node_classification: bool = False       # --node_classification (:105)

    # ---- sampler (arg_parser.py:18-21,115-116) ----
    sampler_type: Optional[str] = None      # imle | aimle | simple | gumbel | None
    sample_k: Optional[int] = None
    nb_samples: int = 1
    alpha: float = 1.0
    beta: float = 10.0
    tau: float = 1.0

    # ---- data ----
    data_dir: str = "./data"                # GQA questions + sceneGraphs root
    meta_dir: str = os.environ.get(
        "ISUBGVQA_META_DIR", "/root/reference/ISubGVQA/meta_info"
    )
    glove_path: Optional[str] = None        # optional glove.6B.300d.txt
    # pretrained CLIP text token/position tables (.npz/.safetensors/.pth)
    # for fresh-model init — the reference deep-copies them from
    # CLIPModel at construction (isubgvqa.py:119-121).  None = random
    # init (sandbox default; convert.py still loads full checkpoints).
    clip_weights: Optional[str] = None
    clip_tokenizer_dir: Optional[str] = None  # optional CLIP vocab.json/merges.txt
    text_vocab_size: int = 49408            # CLIP vocab size
    question_len: int = 32                  # static padded question length
    max_nodes_per_graph: int = 128          # dense per-graph node cap (static)
    max_edges_per_graph: int = 384          # dense per-graph edge cap (static)
    # size buckets (node caps, ascending; the largest is clamped to
    # max_nodes_per_graph).  GQA graphs average ~17 nodes, so most
    # batches compile/run at the small shapes instead of paying the
    # full cap's padding (PyG ragged-batching parity, gqa.py:260).
    # Empty tuple disables bucketing.
    bucket_node_caps: Tuple[int, ...] = (16, 32, 64, 128)
    # question-length caps crossed with the node caps.  GQA questions
    # are 7-20 CLIP tokens; padding every batch to question_len wastes
    # more than half the question-transformer FLOPs (which dominate
    # the forward).  The reference pads per batch (gqa.py:253-258,
    # padding=True) — length bucketing is the static-shape version of
    # that, with the same property that a question's encoding depends
    # on its batch's padded length (the additive float-mask quirk).
    bucket_question_lens: Tuple[int, ...] = (16,)
    synthetic: bool = False                 # use the synthetic mini-GQA fixture
    synthetic_size: int = 2048
    # size distribution of the synthetic fixture: "small" (3-24-node
    # graphs, the fast CI default) or "gqa" (GQA-realistic lognormal
    # node counts up to 120 + 30% long questions — what bench.py and
    # the convergence runs use; data/synthetic.py:SyntheticGQA)
    synthetic_shape_mix: str = "small"

    # ---- training (main.py / arg_parser.py) ----
    batch_size: int = 256                   # --batch-size (:23)
    eval_batch_factor: int = 4              # val/testdev batch x4 (datasets/build.py:55-67)
    lr: float = 5e-5                        # --lr (:24-32)
    scale_factor: int = 1                   # --scale_factor (:34); scales bs & lr (main.py:54-55)
    epochs: int = 100                       # --epochs (:16)
    start_epoch: int = 0
    warmup_epochs: int = 10                 # main.py:115-122
    warmup_start_lr: float = 1e-6
    lr_gamma: float = 0.98                  # ExponentialLR (main.py:115)
    grad_clip_norm: float = 2.0             # train_epoch.py:116
    seed: int = 3407                        # main.py:25
    print_freq: int = 50                    # --print-freq (:48-54)
    evaluate: bool = False
    pre_eval: bool = False
    resume: str = ""
    output_dir: str = "./outputdir"
    log_name: str = "gtsg.log"
    experiment_name: Optional[str] = None
    # jax.profiler trace directory (SURVEY §5 tracing): when set, fit()
    # captures an XProf/TensorBoard trace there and the Trainer logs a
    # per-epoch step-time/memory summary.  Empty = disabled.
    profile_dir: str = ""

    # ---- TPU-native execution ----
    compute_dtype: str = "bfloat16"         # matmul/activation dtype on TPU
    param_dtype: str = "float32"
    data_axis: str = "data"                 # mesh axis for DP
    model_axis: str = "model"               # mesh axis for TP
    num_data_shards: Optional[int] = None   # default: all local devices
    # devices along the model axis: >1 row-shards the big parameter
    # tables (CLIP text embedding, answer head) and their Adam moments
    # over `model` (parallel/mesh.py:TP_PARAM_RULES); XLA partitions
    # the step accordingly.  1 = pure DP (reference semantics).
    model_parallel: int = 1
    use_pallas: bool = True                 # enable Pallas fused kernels where available
    # graphs per fused-GAT grid program, applied to both the inference
    # kernel and the trainable conv.  "auto" (default) picks per bucket
    # shape — small buckets pack several graphs into one grid program,
    # which fills the MXU rows and amortizes per-program overhead
    # (measured -24% device time on the dominant (16,16) bucket).  An
    # int pins it (each kernel clamps to its per-program VMEM caps of
    # 128 nodes / 384-512 edges, so any int is shape-safe); None/1 =
    # unpacked.  Exactness pinned by test_graph_packing_is_exact /
    # test_fused_gatconv_packed_grads_match.
    kernel_pack: Union[int, str, None] = "auto"
    donate_state: bool = True
    # optimizer updates per device dispatch: >1 stacks that many
    # same-bucket batches and runs them as one lax.scan program
    # (train/steps.py:make_multistep_train_step).  The K scanned
    # updates are exactly K sequential train steps; across buckets the
    # per-shape grouping permutes the (already shuffled) batch order,
    # so every batch still trains exactly once per epoch.  Host
    # dispatch overhead is paid once per K steps.  1 = reference
    # dispatch granularity.
    multistep: int = 1

    def scaled(self) -> "Config":
        """Apply the reference's linear batch/lr scaling (main.py:54-55)."""
        return dataclasses.replace(
            self,
            batch_size=self.batch_size * self.scale_factor,
            lr=self.lr * self.scale_factor,
            scale_factor=1,
        )

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "Config":
        d = json.loads(s)
        fields = {f.name for f in dataclasses.fields(cls)}
        d = {k: v for k, v in d.items() if k in fields}
        if "mgat_masks" in d and d["mgat_masks"] is not None:
            d["mgat_masks"] = tuple(d["mgat_masks"])
        if "bucket_node_caps" in d and d["bucket_node_caps"] is not None:
            d["bucket_node_caps"] = tuple(d["bucket_node_caps"])
        if "bucket_question_lens" in d and d["bucket_question_lens"] is not None:
            d["bucket_question_lens"] = tuple(d["bucket_question_lens"])
        return cls(**d)
