"""CLI entry points — the typed replacement for the reference's 25+ shell
scripts and root-level tools (SURVEY.md section 5 "config/flag system").

Subcommands:
  prepare-data : VCF -> HDF5 cache, frequency table, window CSV, panel split
                 (prepare_data_v4_0411.py, scripts/split_data.py,
                  scripts/prepare_val_data.py)
  build-index  : reference VCF -> per-window device-ready index shards
                 (build_ref_db.py / build_ref_db_l2.py /
                  build_ref_db_intersect.py)
  query        : batch k-NN query engine with per-window timing + recall
                 (test_faiss.py / batch_test_faiss_l2.py /
                  test_faiss_intersect.py / partial_faiss_intersect.py)
  train        : embedding-RAG training (src/train_embedding_rag.py)
  infer        : window-major imputation -> VCF (src/infer_embedding_rag.py)

Run as ``python -m rag_snvbert_tpu.cli.main <subcommand> --help``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def _pin_small_workloads_to_cpu(n_elements: int, threshold: int = 20_000_000):
    """Tiny workloads run faster on the host CPU than through a (possibly
    remote) TPU's per-shape compile latency; chromosome-scale stays on
    device.  Returns True if pinned."""
    import jax

    if n_elements < threshold and jax.default_backend() != "cpu":
        try:
            jax.config.update("jax_default_device", jax.devices("cpu")[0])
            return True
        except RuntimeError:
            pass
    return False


def _add_model_args(p):
    p.add_argument("--dims", type=int, default=384)
    p.add_argument("--layers", type=int, default=12)
    p.add_argument("--attn-heads", type=int, default=12)
    p.add_argument("--seq-len", type=int, default=1030)
    p.add_argument("--rag-k", type=int, default=None)


# ---------------------------------------------------------------------------
# prepare-data
# ---------------------------------------------------------------------------

def cmd_prepare_data(args):
    from ..io.freq import FreqTable, build_freq_matrix
    from ..io.panel import PanelData
    from ..io.vcf import load_vcf_or_hdf5
    from ..io.windows import Window

    os.makedirs(args.out, exist_ok=True)
    data = load_vcf_or_hdf5(args.vcf)
    print(f"loaded {data.n_variants} sites x {data.n_samples} samples")

    panel = PanelData.from_file(args.panel)
    panel.save_pop_json(os.path.join(args.out, "POP.json"))
    pop_class = np.asarray([panel.pop_to_class[p] for p in panel.pop_list])

    freq = FreqTable(build_freq_matrix(data.gt, pop_class,
                                       len(panel.pop_to_class)), data.pos)
    freq.save(os.path.join(args.out, "freq"))
    print(f"freq table: {freq.freq.shape}")

    win = Window.fixed_stride(data.n_variants, args.window_len)
    win.save_csv(os.path.join(args.out, "windows.csv"))
    print(f"windows: {win.count} x <= {args.window_len} sites")

    if args.split_test_fraction > 0:
        tr, te = panel.split_stratified(args.split_test_fraction, args.seed)
        np.save(os.path.join(args.out, "train_samples.npy"), np.asarray(tr))
        np.save(os.path.join(args.out, "test_samples.npy"), np.asarray(te))
        print(f"split: {len(tr)} train / {len(te)} test samples")


# ---------------------------------------------------------------------------
# build-index
# ---------------------------------------------------------------------------

def cmd_build_index(args):
    """Genotype-space index build (build_ref_db_l2.py semantics): per
    window, flatten [samples, win_len, 2] -> [samples, win_len*2] f32 and
    persist the flat-L2 shard; ``--mode intersect`` stores raw arrays +
    positions only (index built at query time after position intersection,
    build_ref_db_intersect.py)."""
    from ..index.flat import FlatL2Index
    from ..io.vcf import load_vcf_or_hdf5
    from ..io.windows import Window

    os.makedirs(args.out, exist_ok=True)
    data = load_vcf_or_hdf5(args.vcf)
    pop_labels = None
    if getattr(args, "panel", None):
        from ..io.panel import PanelData

        panel = PanelData.from_file(args.panel)
        assert panel.n_samples == data.n_samples, (
            f"panel has {panel.n_samples} samples, VCF {data.n_samples}")
        pop_labels = np.asarray(panel.pop_list, object)
    win = (Window.from_file(args.windows) if args.windows
           else Window.fixed_stride(data.n_variants, args.window_len))
    _pin_small_workloads_to_cpu(
        data.n_variants * data.n_samples * 2)
    t0 = time.time()
    for w in range(win.count):
        s, e = win.bounds(w)
        block = data.gt[s:e]                          # [n, S, 2]
        flat = block.transpose(1, 0, 2).reshape(data.n_samples, -1)
        np.save(os.path.join(args.out, f"window_{w}.npy"), flat)
        np.save(os.path.join(args.out, f"window_{w}_pos.npy"), data.pos[s:e])
        if pop_labels is not None:
            # per-index-row population labels for query --verbose (the
            # reference's window_*_pop.npy, test_faiss.py:126-131)
            np.save(os.path.join(args.out, f"window_{w}_pop.npy"),
                    pop_labels)
        if args.mode == "flat":
            import jax.numpy as jnp

            if args.dtype == "packed":
                # Planar bit-packed binary genotypes: 1/8 the HBM of int8,
                # searched exact-L2 by the kernel's in-VMEM unpack path.
                idx = FlatL2Index.build(flat.astype(np.int8), pack=8,
                                        align=True)
            else:
                dt = {"f32": jnp.float32, "bf16": jnp.bfloat16,
                      "int8": jnp.int8}[args.dtype]
                idx = FlatL2Index.build(flat.astype(np.float32), dtype=dt,
                                        align=True)
            idx.save(os.path.join(args.out, f"window_{w}.idx"))
    meta = {"windows": win.count, "n_samples": data.n_samples,
            "mode": args.mode, "build_seconds": round(time.time() - t0, 3)}
    with open(os.path.join(args.out, "meta.json"), "w") as f:
        json.dump(meta, f)
    print(json.dumps(meta))


# ---------------------------------------------------------------------------
# query
# ---------------------------------------------------------------------------

def cmd_query(args):
    """Batch query engine with per-window timing, replicating the
    measurement style of test_faiss.py:100-168 / batch_test_faiss_l2.py,
    plus an exact-recall column the reference lacked.

    Modes: flat (persisted shards), intersect (position-intersect then
    search, optionally --hamming), partial (masked-dimension search over
    the same index — no rebuild).

    ``--index-shards S`` (> 1) runs the search on a ShardedFlatL2Index
    over an S-wide ``index`` mesh axis — per-device shard search + exact
    ICI candidate merge (index/sharded.py), the offline multi-chip
    chromosome-scale surface mirroring `train --index-shards` (round-4
    VERDICT item 4).  Results are exact and id-identical to the
    single-device path; supported for flat and intersect (L2) modes."""
    import jax.numpy as jnp

    from ..index.flat import FlatL2Index, HammingIndex
    from ..io.vcf import load_vcf_or_hdf5

    data = load_vcf_or_hdf5(args.vcf)
    with open(os.path.join(args.db, "meta.json")) as f:
        meta = json.load(f)
    _pin_small_workloads_to_cpu(
        data.n_variants * max(meta.get("n_samples", 1), 1) * 2)
    mesh = None
    if getattr(args, "index_shards", 1) > 1:
        if args.mode == "partial" or args.hamming:
            raise SystemExit("--index-shards supports the L2 flat/"
                             "intersect modes (masked/partial search is "
                             "single-device; Hamming is retired — see "
                             "DESIGN.md)")
        import jax

        from ..parallel.mesh import make_mesh

        devs = jax.devices()
        if len(devs) < args.index_shards:
            # default backend too small (e.g. one attached TPU): fall back
            # to the host-platform virtual devices
            # (xla_force_host_platform_device_count), the same substrate
            # the mesh test tier runs on
            try:
                cpus = jax.devices("cpu")
            except RuntimeError:
                cpus = []
            if len(cpus) >= args.index_shards:
                devs = cpus
        mesh = make_mesh(n_data=1, n_index=args.index_shards,
                         devices=devs[: args.index_shards])

    def build_sharded(rows: np.ndarray, like: "FlatL2Index | None"):
        """ShardedFlatL2Index over the mesh, preserving the storage mode
        of the persisted index when given one."""
        from ..index.sharded import ShardedFlatL2Index

        if like is not None and like.pack > 1:
            return ShardedFlatL2Index.build(mesh, rows.astype(np.int8),
                                            pack=like.pack)
        dt = like.vectors.dtype if like is not None else jnp.float32
        return ShardedFlatL2Index.build(mesh, rows.astype(np.float32),
                                        dtype=dt)

    totals = {"build_t": 0.0, "search_t": 0.0, "n_queries": 0}
    for w in range(meta["windows"]):
        ref_flat = np.load(os.path.join(args.db, f"window_{w}.npy"))
        ref_pos = np.load(os.path.join(args.db, f"window_{w}_pos.npy"))

        t0 = time.time()
        if args.mode == "intersect":
            # position intersect, then build a temporary index over the
            # common sites (test_faiss_intersect.py:127-183)
            found = np.searchsorted(data.pos, ref_pos)
            found = np.clip(found, 0, len(data.pos) - 1)
            common = data.pos[found] == ref_pos
            cols = np.repeat(common, 2)
            ref_sub = ref_flat[:, cols]
            q = data.gt[found[common]].transpose(1, 0, 2).reshape(
                data.n_samples, -1).astype(np.float32)
            if args.hamming:
                idx = HammingIndex.build(ref_sub)
                build_t = time.time() - t0
                t0 = time.time()
                vals, ids = idx.search(jnp.asarray(q.astype(np.int8)), args.k)
            elif mesh is not None:
                idx = build_sharded(ref_sub, like=None)
                build_t = time.time() - t0
                t0 = time.time()
                vals, ids = idx.search(q, args.k)
            else:
                idx = FlatL2Index.build(ref_sub.astype(np.float32))
                build_t = time.time() - t0
                t0 = time.time()
                vals, ids = idx.search(q, args.k)
        else:
            idx = FlatL2Index.load(os.path.join(args.db, f"window_{w}.idx"))
            if mesh is not None:
                # shard the raw rows in the persisted index's storage mode;
                # the .npy rows are the same vectors the .idx was built from
                idx = build_sharded(ref_flat, like=idx)
            found = np.searchsorted(data.pos, ref_pos)
            found = np.clip(found, 0, len(data.pos) - 1)
            common = data.pos[found] == ref_pos
            rows = np.where(common, found, 0)
            g = data.gt[rows]                      # [n, S, 2]
            g = np.where(common[:, None, None], g, 0)
            q = g.transpose(1, 0, 2).reshape(data.n_samples, -1).astype(np.float32)
            build_t = time.time() - t0
            t0 = time.time()
            if args.mode == "partial":
                dim_mask = jnp.asarray(np.repeat(common, 2).astype(np.float32))
                vals, ids = idx.masked_search(q, dim_mask, args.k)
            else:
                vals, ids = idx.search(q, args.k)
        import jax
        jax.block_until_ready((vals, ids))
        search_t = time.time() - t0
        totals["build_t"] += build_t
        totals["search_t"] += search_t
        totals["n_queries"] += q.shape[0]
        if args.save_results:
            # persisted (distances, ids) per window — the consumable the
            # reference's offline engine prints to stdout (test_faiss.py:
            # 135-140); also the exactness surface for --index-shards
            os.makedirs(args.save_results, exist_ok=True)
            np.save(os.path.join(args.save_results, f"window_{w}_ids.npy"),
                    np.asarray(ids))
            np.save(os.path.join(args.save_results, f"window_{w}_vals.npy"),
                    np.asarray(vals))
        if args.verbose:
            # Human correctness spot-check (reference test_faiss.py:
            # 146-164): best hit's id/dist, its population label when the
            # index was built with --panel, and target-vs-neighbor allele
            # snippets that should visibly agree for a sane index.
            v0 = np.asarray(vals)[0]
            best = int(np.asarray(ids)[0][0])
            line = (f"window {w}: build {build_t:.3f}s search "
                    f"{search_t:.3f}s best id {best} dist {v0[0]:.1f}")
            pop_path = os.path.join(args.db, f"window_{w}_pop.npy")
            if os.path.exists(pop_path):
                pops = np.load(pop_path, allow_pickle=True)
                if best < len(pops):
                    line += f" pop {pops[best]}"
            print(line)
            ref_rows = ref_sub if args.mode == "intersect" else ref_flat
            show = min(args.show_snp_len * 2, q.shape[1])
            tgt = q[0, :show].astype(np.int8).tolist()
            nb = ref_rows[best, :show].astype(np.int8).tolist()
            print(f"  target snippet => {tgt}")
            print(f"  neighb snippet => {nb}")
    totals["qps"] = round(totals["n_queries"] / max(totals["search_t"], 1e-9), 1)
    print(json.dumps(totals))


# ---------------------------------------------------------------------------
# train
# ---------------------------------------------------------------------------

def _resolve_trainer_config(args, base):
    """Preset-first hyperparameter resolution: the preset supplies the
    versioned recipe (lr, batch, gamma, warmup, ...) and an explicit CLI
    flag overrides it — `train --preset v17_token_rag` reproduces the v17
    recipe exactly (run_v17_FIXED.sh), not a silent argparse hybrid."""
    from ..train.trainer import TrainerConfig

    def pick(flag_value, preset_value):
        return preset_value if flag_value is None else flag_value

    return TrainerConfig(
        rag_mode=base.model.rag_mode,
        epochs=pick(args.epochs, base.epochs),
        batch_size=pick(args.train_batch_size, base.batch_size),
        val_batch_size=pick(args.val_batch_size, base.val_batch_size),
        init_lr=pick(args.init_lr, base.init_lr),
        max_lr=pick(args.lr, base.max_lr),
        warmup_steps=pick(args.warmup_steps, base.warmup_steps),
        grad_accum_steps=pick(args.grad_accum_steps, base.grad_accum_steps),
        focal_gamma=pick(args.focal_gamma, base.focal_gamma),
        use_recon_loss=base.use_recon_loss,
        rag_k=pick(args.rag_k, base.rag_k),
        rare_threshold=pick(args.rare_threshold, base.rare_threshold),
        patience=pick(args.patience, base.patience),
        min_delta=pick(args.min_delta, base.min_delta),
        output_dir=args.output_path,
        log_freq=args.log_freq, seed=args.seed,
        rng_impl=args.rng_impl, prefetch_ctx=args.prefetch_ctx,
        prefetch_batches=args.prefetch_batches,
        mask_schedule=args.mask_schedule,
        steps_per_dispatch=args.steps_per_dispatch,
        shard_ctx={"auto": "auto", "on": True, "off": False}[args.shard_ctx],
        ctx_merge=args.ctx_merge,
        profile_dir=args.profile_dir, profile_steps=args.profile_steps)


def cmd_train(args):
    from ..data.pipeline import WindowDataset
    from ..io.freq import FreqTable
    from ..io.panel import PanelData
    from ..io.vcf import load_vcf_or_hdf5
    from ..io.vocab import Vocab
    from ..io.windows import Window
    from ..models import BERTFoundationModel, BERTWithEmbeddingRAG
    from ..train.trainer import Trainer

    from ..config import get_preset

    preset = get_preset(args.preset) if args.preset else None
    base = preset or get_preset("v18_embedding_rag")

    train_vcf = load_vcf_or_hdf5(args.train_dataset)
    panel = PanelData.from_file(args.train_panel)
    win = Window.from_file(args.window_path)
    ref_vcf = load_vcf_or_hdf5(args.refpanel_path)
    freq = _load_freq(args.freq_path, ref_vcf)
    vocab = Vocab.from_panel_pops(panel.pop_list)

    train_ds = WindowDataset(train_vcf, panel, freq, win.window_info, vocab,
                             ref_vcf=ref_vcf, seq_len=args.seq_len)
    val_ds = None
    if args.val_dataset:
        val_vcf = load_vcf_or_hdf5(args.val_dataset)
        val_panel = PanelData.from_file(args.val_panel or args.train_panel)
        val_ds = WindowDataset(val_vcf, val_panel, freq, win.window_info,
                               vocab, ref_vcf=ref_vcf, seq_len=args.seq_len)
    # Single-cohort train/val via the stratified split indices written by
    # prepare-data (train_samples.npy / test_samples.npy) — the reference's
    # scripts/split_data.py workflow.
    train_ids = np.load(args.train_samples) if args.train_samples else None
    val_ids = np.load(args.val_samples) if args.val_samples else None

    init_meta = None
    if args.init_from:
        from ..interop import load_convert_meta

        init_meta = load_convert_meta(args.init_from)
    if init_meta is not None:
        # Fine-tuning a converted reference checkpoint: the architecture
        # comes from convert_meta.json (post-LN, frozen BatchNorm stats,
        # per-block params); training-perf knobs (remat, flash kernels,
        # dtypes) still come from the preset.
        import dataclasses
        if init_meta["vocab_size"] != vocab.size:
            raise SystemExit(
                f"converted checkpoint vocab_size={init_meta['vocab_size']} "
                f"!= panel vocab {vocab.size} — population sets differ")
        mc = dataclasses.replace(
            base.model, dims=init_meta["dims"],
            n_layers=init_meta["n_layers"],
            attn_heads=init_meta["attn_heads"],
            rag_mode=init_meta["rag_mode"],
            pre_ln=init_meta.get("pre_ln", False),
            pos_norm=init_meta.get("pos_norm", "frozen_batch"),
            compat_double_softmax=init_meta.get("compat_double_softmax",
                                                False),
            # converted params are per-block and unfused
            scan_layers=False, fused_qkv=False)
        # the trainer's retrieval mode must follow the checkpoint's
        # architecture, not the preset's (_resolve_trainer_config reads
        # base.model.rag_mode)
        base = dataclasses.replace(base, model=mc)
        model = base.build_model(vocab_size=vocab.size)
    elif preset is not None:
        model = preset.build_model(vocab_size=vocab.size)
    else:
        bert = BERTWithEmbeddingRAG(vocab_size=vocab.size, dims=args.dims,
                                    n_layers=args.layers,
                                    attn_heads=args.attn_heads)
        model = BERTFoundationModel(bert=bert)

    def embed_fn(p, toks, af, deterministic, rngs=None):
        return model.apply({"params": p}, toks, af, deterministic,
                           method=model.embed, rngs=rngs)

    mesh = None
    if (args.data_parallel > 1 or args.index_shards > 1
            or args.tensor_parallel > 1):
        from ..parallel.mesh import make_mesh

        mesh = make_mesh(n_data=args.data_parallel,
                         n_index=args.index_shards,
                         n_model=args.tensor_parallel)

    cfg = _resolve_trainer_config(args, base)
    trainer = Trainer(model, embed_fn, train_ds, cfg, val_ds=val_ds,
                      mesh=mesh, train_sample_ids=train_ids,
                      val_sample_ids=val_ids)
    if args.resume_path:
        trainer.restore_checkpoint(args.resume_path)
    elif args.init_from:
        trainer.init_params_from(args.init_from)
    result = trainer.fit()
    print(json.dumps({"best": result["best"],
                      "best_epoch": result["best_epoch"]}))


# ---------------------------------------------------------------------------
# infer
# ---------------------------------------------------------------------------

def _load_infer_model(args):
    """Build the model from preset/flags and restore checkpoint params
    (shared by the infer and serve subcommands).  Returns
    (model, embed_fn, params, rag_mode)."""
    import jax
    from ..models import BERTFoundationModel, BERTWithEmbeddingRAG

    if args.panel:
        from ..io.panel import PanelData
        from ..io.vocab import Vocab

        panel = PanelData.from_file(args.panel)
        vocab_size = Vocab.from_panel_pops(panel.pop_list).size
    else:
        vocab_size = args.vocab_size
    rag_mode = args.rag_mode
    from ..interop import load_convert_meta

    cmeta = load_convert_meta(args.model_path)
    if cmeta is not None:
        # Converted reference checkpoint: build the exact architecture the
        # conversion recorded (post-LN, frozen BatchNorm position stats,
        # logits heads) instead of trusting preset/flags.
        import jax.numpy as jnp

        from ..models import BERT, BERTWithRAG

        if rag_mode is None:
            rag_mode = cmeta["rag_mode"]
        cls = {"embedding": BERTWithEmbeddingRAG, "token": BERTWithRAG,
               "none": BERT}[rag_mode]
        bert = cls(vocab_size=cmeta["vocab_size"], dims=cmeta["dims"],
                   n_layers=cmeta["n_layers"],
                   attn_heads=cmeta["attn_heads"],
                   pre_ln=cmeta.get("pre_ln", False),
                   pos_norm=cmeta.get("pos_norm", "frozen_batch"),
                   dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
                   attn_dropout=0.0 if args.no_attn_dropout else None,
                   # scan_layers stacks the block params; converted ckpts
                   # are written per-block, so it must stay off here.
                   scan_layers=False,
                   score_dtype=(jnp.bfloat16 if args.score_bf16
                                else jnp.float32))
        model = BERTFoundationModel(
            bert=bert,
            compat_double_softmax=cmeta.get("compat_double_softmax", False))
    elif args.preset:
        from ..config import get_preset

        preset = get_preset(args.preset)
        if rag_mode is None:
            rag_mode = preset.model.rag_mode
        model = preset.build_model(vocab_size=vocab_size)
    else:
        import jax.numpy as jnp

        from ..models import BERT, BERTWithRAG

        if rag_mode is None:
            rag_mode = "embedding"
        cls = {"embedding": BERTWithEmbeddingRAG, "token": BERTWithRAG,
               "none": BERT}[rag_mode]
        bert = cls(
            vocab_size=vocab_size, dims=args.dims, n_layers=args.layers,
            attn_heads=args.attn_heads, pre_ln=args.pre_ln,
            scan_layers=args.scan_layers, remat=args.remat,
            dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
            attn_dropout=0.0 if args.no_attn_dropout else None,
            score_dtype=jnp.bfloat16 if args.score_bf16 else jnp.float32)
        model = BERTFoundationModel(bert=bert)

    # Trainer checkpoints hold {params, opt_state, step, epoch, level};
    # inference needs only the params.  Device-agnostic restore
    # (utils/ckpt.py): an untargeted restore pins to the devices recorded
    # at save time, which may not exist in this process.
    from ..utils.ckpt import restore_tree
    restored = restore_tree(args.model_path)
    import jax.numpy as _jnp
    params = jax.tree.map(_jnp.asarray, restored["params"])

    def embed_fn(p, toks, af, deterministic, rngs=None):
        return model.apply({"params": p}, toks, af, deterministic,
                           method=model.embed, rngs=rngs)

    return model, embed_fn, params, rag_mode


def _infer_mesh(args):
    """Serving mesh from --data-parallel (None = single device)."""
    if getattr(args, "data_parallel", 1) <= 1:
        return None
    from ..parallel.mesh import make_mesh
    return make_mesh(n_data=args.data_parallel, n_index=1)


def _load_freq(path: str, ref_vcf):
    """Load a frequency table: our prepare-data ``freq.npz`` artifact, or
    a reference-format ``Freq.npy`` (``freq[4, P+1, V]`` whose columns
    follow the reference panel's site order — the pos_to_idx pickle of
    prepare_data_v4_0411.py:170-235, reconstructed here from the panel
    VCF's positions)."""
    from ..io.freq import FreqTable

    if str(path).endswith(".npy"):
        return FreqTable.load_reference_npy(path, ref_vcf.pos)
    return FreqTable.load(path)


def cmd_infer(args):
    from ..infer.imputer import Imputer
    from ..io.freq import FreqTable
    from ..io.vcf import load_vcf_or_hdf5

    ref_vcf = load_vcf_or_hdf5(args.refpanel_path)
    target = load_vcf_or_hdf5(args.target)
    freq = _load_freq(args.freq_path, ref_vcf)
    model, embed_fn, params, rag_mode = _load_infer_model(args)

    imp = Imputer(model, embed_fn, params, ref_vcf, freq,
                  window_len=args.infer_window_len, seq_len=args.seq_len,
                  rag_k=args.rag_k if args.rag_k is not None else 1,
                  batch_size=args.batch_size, rag_mode=rag_mode,
                  index_dir=args.index_dir, mesh=_infer_mesh(args))
    if args.save_index_dir:
        manifest = imp.save_window_indexes(args.save_index_dir, target)
        print(json.dumps({"saved_indexes": manifest}))
    if args.progressive_rounds > 1:
        res = imp.impute_progressive(target, rounds=args.progressive_rounds)
    else:
        res = imp.impute(target)
    if args.npy_prefix:
        res.save_npy(args.npy_prefix)
    res.write_vcf(args.output_vcf, ref_vcf, target.samples)
    print(json.dumps({"sites": int(res.pos.shape[0]),
                      "samples": len(target.samples),
                      "imputed_sites": int(res.imputed_flag.sum())}))


# ---------------------------------------------------------------------------
# serve
# ---------------------------------------------------------------------------

def cmd_serve(args):
    """Persistent imputation service (infer/serve.py): model + reference
    panel load once, then JSON-lines requests on stdin ->
    responses on stdout.  Request: {"target": path, "output_vcf": path,
    "npy_prefix"?: path, "progressive_rounds"?: int}."""
    from ..infer.serve import BatchingImputationService, ImputationService
    from ..io.freq import FreqTable
    from ..io.vcf import load_vcf_or_hdf5

    ref_vcf = load_vcf_or_hdf5(args.refpanel_path)
    freq = _load_freq(args.freq_path, ref_vcf)
    model, embed_fn, params, rag_mode = _load_infer_model(args)
    # HTTP front-end: concurrent clients -> cross-request batched
    # scheduling; the stdin JSON-lines loop is single-flight by nature.
    svc_cls = (BatchingImputationService if args.http is not None
               else ImputationService)
    svc = svc_cls.create(
        model, embed_fn, params, ref_vcf, freq,
        window_len=args.infer_window_len, seq_len=args.seq_len,
        rag_k=args.rag_k if args.rag_k is not None else 1,
        batch_size=args.batch_size, rag_mode=rag_mode,
        index_dir=args.index_dir, mesh=_infer_mesh(args))
    if args.http is not None:
        from ..infer.httpd import serve_http
        host, _, port = args.http.rpartition(":")
        if not port.isdigit():
            raise SystemExit(
                f"serve: --http expects [HOST:]PORT, got {args.http!r}")
        serve_http(svc, host or "127.0.0.1", int(port))
        return
    print(json.dumps({"ready": True, "ref_sites": ref_vcf.n_variants}),
          flush=True)
    n = svc.serve_lines(sys.stdin, sys.stdout)
    print(json.dumps({"served": n}), file=sys.stderr)


# ---------------------------------------------------------------------------
# emit-vcf / analyze
# ---------------------------------------------------------------------------

def cmd_emit_vcf(args):
    """NPY probability matrices -> imputed VCF (generate_vcf.py:1-46
    parity: consumes the save_npy_result layout)."""
    from ..io.vcf import load_vcf_or_hdf5, write_imputed_vcf

    hap1 = np.load(args.npy_prefix + ".HAP1.npy")
    hap2 = np.load(args.npy_prefix + ".HAP2.npy")
    pos = np.load(args.npy_prefix + ".POS.npy")
    flag = np.load(args.npy_prefix + ".POS_Flag.npy")
    ref_vcf = load_vcf_or_hdf5(args.refpanel_path)
    samples = (args.samples.split(",") if args.samples
               else [f"S{i}" for i in range(hap1.shape[1])])
    write_imputed_vcf(args.output_vcf, ref_vcf.chrom, pos, ref_vcf.ref,
                      ref_vcf.alt, samples, hap1, hap2, imputed_flag=flag)
    print(json.dumps({"sites": int(pos.shape[0]), "samples": len(samples)}))


def cmd_analyze(args):
    """Training-run analysis: metrics plot + frequency-table audit
    (scripts/analyze_training_log.py / plot_metrics_csv.py / test_fq.py)."""
    from ..utils.analyze import epoch_summary, inspect_freq, plot_metrics

    if args.run_dir:
        df = epoch_summary(args.run_dir)
        print(df.to_string(index=False))
        out = plot_metrics(args.run_dir)
        print(f"plot: {out}")
    if args.freq_path:
        print(json.dumps(inspect_freq(args.freq_path), indent=2))


def cmd_convert_ckpt(args):
    """Reference torch checkpoint -> servable flax checkpoint.

    Handles both the reference trainer's whole-module pickles
    (src/main/pretrain_with_val_optimized.py:524-548 — needs --ref-src
    pointing at the RAG-SNVBERT repo so the pickle's classes resolve)
    and raw state_dict pickles.  The output directory drops straight
    into ``infer/serve --model_path`` (architecture auto-configured
    from convert_meta.json)."""
    from ..interop import convert_state_dict, load_torch_checkpoint, \
        save_converted

    sd, heads = load_torch_checkpoint(args.torch_ckpt, ref_src=args.ref_src)
    params, meta = convert_state_dict(sd, rag_mode=args.rag_mode)
    meta["attn_heads"] = args.attn_heads or heads
    if meta["attn_heads"] is None:
        raise SystemExit("attention head count is not recoverable from a "
                         "raw state_dict — pass --attn-heads")
    save_converted(params, meta, args.out)
    print(json.dumps({k: meta[k] for k in
                      ("dims", "n_layers", "attn_heads", "vocab_size",
                       "rag_mode")} | {"out": os.path.abspath(args.out)}))


def cmd_export_ckpt(args):
    """TPU checkpoint -> reference torch state_dict (the reverse of
    convert-ckpt): load the exported file in the reference codebase with
    ``model.load_state_dict(torch.load(path))``.  Exact for models with
    pos_norm="frozen_batch" (converted/fine-tuned reference
    checkpoints); natively trained GroupNorm models need
    --approx-pos-norm (position-branch numerics differ)."""
    import torch

    from ..interop import export_state_dict, load_params_checkpoint

    params = load_params_checkpoint(args.ckpt)
    sd = export_state_dict(params, approx_pos_norm=args.approx_pos_norm)
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v)) for k, v
                in sd.items()}, args.out)
    print(json.dumps({"keys": len(sd), "out": os.path.abspath(args.out)}))


# ---------------------------------------------------------------------------

def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="rag-snvbert-tpu", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    pp = sub.add_parser("prepare-data")
    pp.add_argument("--vcf", required=True)
    pp.add_argument("--panel", required=True)
    pp.add_argument("--out", required=True)
    pp.add_argument("--window-len", type=int, default=1020)
    pp.add_argument("--split-test-fraction", type=float, default=0.0)
    pp.add_argument("--seed", type=int, default=0)
    pp.set_defaults(fn=cmd_prepare_data)

    pb = sub.add_parser("build-index")
    pb.add_argument("--vcf", required=True)
    pb.add_argument("--out", required=True)
    pb.add_argument("--windows", default=None)
    pb.add_argument("--window-len", type=int, default=1020)
    pb.add_argument("--mode", choices=["flat", "intersect"], default="flat")
    pb.add_argument("--dtype", choices=["f32", "bf16", "int8", "packed"],
                    default="f32",
                    help="index storage dtype; int8 is exact for binary "
                         "genotypes and runs the MXU's double-rate path; "
                         "packed stores 8 genotypes/byte (1/8 the HBM, "
                         "still exact L2 — the packbits DB equivalent)")
    pb.add_argument("--panel", default=None,
                    help="panel file: stores per-row population labels "
                         "(window_*_pop.npy) for query --verbose")
    pb.set_defaults(fn=cmd_build_index)

    pq = sub.add_parser("query")
    pq.add_argument("--vcf", required=True, help="target samples VCF/H5")
    pq.add_argument("--db", required=True)
    pq.add_argument("--k", type=int, default=10)
    pq.add_argument("--mode", choices=["flat", "intersect", "partial"],
                    default="flat")
    pq.add_argument("--hamming", action="store_true",
                    help="binary XOR+popcount engine (the reference's "
                         "IndexBinaryFlat). Exact but measured 37.6x "
                         "slower than the default packed-L2 MXU path, "
                         "which ranks 0/1 data identically (L2^2 == "
                         "Hamming on bits) — see DESIGN.md")
    pq.add_argument("--verbose", action="store_true",
                    help="per-window best-hit line with neighbor "
                         "population + allele snippets (the reference's "
                         "human correctness spot-check, test_faiss.py)")
    pq.add_argument("--save-results", dest="save_results", default=None,
                    help="directory for per-window ids/distances .npy")
    pq.add_argument("--index-shards", dest="index_shards", type=int,
                    default=1,
                    help="shard each window's index over an N-wide mesh "
                    "'index' axis (exact ICI candidate merge) — the "
                    "offline counterpart of train --index-shards")
    pq.add_argument("--show-snp-len", type=int, default=10,
                    help="alleles per snippet in --verbose output")
    pq.set_defaults(fn=cmd_query)

    pt = sub.add_parser("train")
    pt.add_argument("--preset", default=None,
                    help="named config preset (see rag_snvbert_tpu/config.py)")
    pt.add_argument("--train_dataset", required=True)
    pt.add_argument("--train_panel", required=True)
    pt.add_argument("--val_dataset", default=None)
    pt.add_argument("--val_panel", default=None)
    pt.add_argument("--refpanel_path", required=True)
    pt.add_argument("--freq_path", required=True)
    pt.add_argument("--window_path", required=True)
    _add_model_args(pt)
    # Run hyperparams default to None: unset flags inherit the preset's
    # recipe (or the v18 defaults without --preset); set flags override.
    pt.add_argument("--epochs", type=int, default=None)
    pt.add_argument("--train_batch_size", type=int, default=None)
    pt.add_argument("--val_batch_size", type=int, default=None)
    pt.add_argument("--lr", type=float, default=None)
    pt.add_argument("--init_lr", type=float, default=None)
    pt.add_argument("--warmup_steps", type=int, default=None)
    pt.add_argument("--grad_accum_steps", type=int, default=None)
    pt.add_argument("--focal_gamma", type=float, default=None)
    pt.add_argument("--patience", type=int, default=None)
    pt.add_argument("--min_delta", type=float, default=None)
    pt.add_argument("--rare_threshold", type=float, default=None)
    pt.add_argument("--resume_path", default=None)
    pt.add_argument("--init-from", dest="init_from", default=None,
                    help="initialize weights from a params checkpoint "
                         "(e.g. convert-ckpt output — fine-tune a trained "
                         "reference model on TPU; fresh optimizer/epoch, "
                         "unlike --resume_path)")
    pt.add_argument("--output_path", required=True)
    pt.add_argument("--log_freq", type=int, default=500)
    pt.add_argument("--seed", type=int, default=42)
    pt.add_argument("--train-samples", dest="train_samples", default=None,
                    help=".npy sample-index subset for training "
                         "(prepare-data --split-test-fraction output)")
    pt.add_argument("--val-samples", dest="val_samples", default=None,
                    help=".npy sample-index subset for validation on the "
                         "training cohort (single-VCF train/val)")
    pt.add_argument("--data-parallel", dest="data_parallel", type=int,
                    default=1, help="devices on the mesh data axis")
    pt.add_argument("--index-shards", dest="index_shards", type=int,
                    default=1, help="devices on the mesh index axis "
                    "(shards the retrieval context)")
    pt.add_argument("--tensor-parallel", dest="tensor_parallel", type=int,
                    default=1, help="devices on the mesh model axis "
                    "(Megatron-style encoder TP via GSPMD shardings; for "
                    "models larger than one chip — the presets fit one)")
    pt.add_argument("--shard-ctx", dest="shard_ctx",
                    choices=["auto", "on", "off"], default="auto")
    pt.add_argument("--ctx-merge", dest="ctx_merge",
                    choices=["all_gather", "ring"], default="all_gather")
    pt.add_argument("--prefetch-ctx", dest="prefetch_ctx",
                    action="store_true",
                    help="dispatch the next window's retrieval-context "
                         "encode behind the current window's steps")
    pt.add_argument("--prefetch-batches", dest="prefetch_batches", type=int,
                    default=2, help="host batch prefetch depth (0 = sync)")
    pt.add_argument("--steps-per-dispatch", dest="steps_per_dispatch",
                    type=int, default=1,
                    help="fuse K same-window train steps into one jitted "
                         "dispatch (lax.scan; amortizes per-dispatch link "
                         "latency, identical semantics)")
    pt.add_argument("--rng-impl", dest="rng_impl",
                    choices=["rbg", "threefry2x32"], default="rbg")
    pt.add_argument("--mask-schedule", dest="mask_schedule",
                    choices=["level", "cosine", "linear", "exponential"],
                    default="level")
    pt.add_argument("--profile-dir", dest="profile_dir", default=None,
                    help="capture a TensorBoard-loadable jax.profiler "
                         "trace of a few steady train steps into this dir")
    pt.add_argument("--profile-steps", dest="profile_steps", type=int,
                    default=4)
    pt.set_defaults(fn=cmd_train)

    def add_infer_model_args(p):
        p.add_argument("--refpanel_path", required=True)
        p.add_argument("--freq_path", required=True)
        p.add_argument("--model_path", required=True)
        p.add_argument("--vocab_size", type=int, default=12,
                       help="used only when --panel is not given")
        p.add_argument("--panel", default=None,
                       help="panel file to derive the vocab size from")
        _add_model_args(p)
        p.add_argument("--infer_window_len", type=int, default=1020)
        p.add_argument("--preset", default=None)
        p.add_argument("--pre_ln", action="store_true")
        p.add_argument("--scan_layers", action="store_true")
        p.add_argument("--remat", action="store_true")
        p.add_argument("--bf16", action="store_true")
        p.add_argument("--score_bf16", action="store_true")
        p.add_argument("--no_attn_dropout", action="store_true")
        p.add_argument("--batch_size", type=int, default=32)
        p.add_argument("--data-parallel", dest="data_parallel", type=int,
                       default=1, help="shard query batches over this many "
                       "devices (mesh data axis) for serving scale-out")
        p.add_argument("--rag-mode", dest="rag_mode", default=None,
                       choices=["embedding", "token", "none"],
                       help="retrieval mode; defaults to the preset's (or "
                            "embedding) — 'token' serves v17_token_rag "
                            "checkpoints")
        p.add_argument("--index-dir", dest="index_dir", default=None,
                       help="load persisted per-window embedding indexes "
                            "(written by --save-index-dir) instead of "
                            "re-encoding the reference panel")

    pi = sub.add_parser("infer")
    pi.add_argument("--target", required=True)
    pi.add_argument("--output_vcf", required=True)
    pi.add_argument("--npy_prefix", default=None)
    add_infer_model_args(pi)
    pi.add_argument("--progressive_rounds", type=int, default=1)
    pi.add_argument("--save-index-dir", dest="save_index_dir", default=None,
                    help="persist per-window embedding indexes for this "
                         "target's mask pattern, then impute")
    pi.set_defaults(fn=cmd_infer)

    ps = sub.add_parser("serve", help="persistent imputation service "
                        "(JSON-lines requests on stdin, or --http)")
    add_infer_model_args(ps)
    ps.add_argument("--http", default=None, metavar="[HOST:]PORT",
                    help="serve over HTTP (GET /health, POST /impute) "
                         "instead of stdin/stdout JSON lines")
    ps.set_defaults(fn=cmd_serve)

    pe = sub.add_parser("emit-vcf")
    pe.add_argument("--npy_prefix", required=True)
    pe.add_argument("--refpanel_path", required=True)
    pe.add_argument("--output_vcf", required=True)
    pe.add_argument("--samples", default=None,
                    help="comma-separated sample names")
    pe.set_defaults(fn=cmd_emit_vcf)

    pa = sub.add_parser("analyze")
    pa.add_argument("--run_dir", default=None)
    pa.add_argument("--freq_path", default=None)
    pa.set_defaults(fn=cmd_analyze)

    pc = sub.add_parser("convert-ckpt", help="convert a trained reference "
                        "(torch) checkpoint for TPU serving")
    pc.add_argument("--torch_ckpt", required=True,
                    help="reference checkpoint (whole-module pickle, e.g. "
                         "rag_bert.model.ep12, or a raw state_dict)")
    pc.add_argument("--out", required=True, help="output checkpoint dir "
                    "(usable as infer/serve --model_path)")
    pc.add_argument("--ref-src", dest="ref_src", default=None,
                    help="RAG-SNVBERT repo root, required to unpickle "
                         "whole-module checkpoints")
    pc.add_argument("--attn-heads", dest="attn_heads", type=int, default=None,
                    help="needed only for raw state_dicts (not inferable "
                         "from tensor shapes)")
    pc.add_argument("--rag-mode", dest="rag_mode", default=None,
                    choices=["embedding", "token", "none"],
                    help="override auto-detection (V17 token checkpoints "
                         "share V18's parameter surface — pass 'token')")
    pc.set_defaults(fn=cmd_convert_ckpt)

    pe = sub.add_parser("export-ckpt", help="export a TPU checkpoint as a "
                        "reference (torch) state_dict")
    pe.add_argument("--ckpt", required=True,
                    help="trainer checkpoint dir or converted checkpoint dir")
    pe.add_argument("--out", required=True, help="output .pt path")
    pe.add_argument("--approx-pos-norm", dest="approx_pos_norm",
                    action="store_true",
                    help="allow exporting GroupNorm-trained models with "
                         "identity-stats BatchNorm (numerics differ in the "
                         "position branch)")
    pe.set_defaults(fn=cmd_export_ckpt)

    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
