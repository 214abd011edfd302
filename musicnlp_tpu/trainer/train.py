"""Training loop: optimizer presets, pjit train step, eval, checkpointing.

Rebuild of the reference train stack (reference musicnlp/trainer/train.py:31-368
`get_model_n_tokenizer`/`TrainArgs`/`get_all_setup`,
musicnlp/util/train/train_util_wrap.py:88-144 `MyTrainer.compute_loss` with
per-step NTP-acc/IKR logging, musicnlp/util/train/trainer_eval_wrap.py:71-452
`MyEvalTrainer` threading `key_scores` through eval).

TPU-native design: ONE jitted train step -- forward, masked CE, NTP accuracy,
IKR (table gathers), grad, AdamW update -- compiled over a (data, model)
`jax.sharding.Mesh`; the batch is sharded on `data`, params follow the
megatron TP rules in parallel/mesh.py, and XLA inserts the grad psum.  The
reference's eval-RAM workarounds (`max_out_logits` argmax-before-gather,
`eval_accumulation_steps`) are unnecessary: metrics reduce on device and only
scalars come back to host.
"""
from __future__ import annotations

import json
import logging
import os
import shutil
import time
from dataclasses import asdict, dataclass
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from musicnlp_tpu.models.transformer_xl import TransfoXL, TransfoXLConfig
from musicnlp_tpu.ops.losses import PT_LOSS_PAD, ikr_from_ids
from musicnlp_tpu.parallel import mesh as mesh_lib
from musicnlp_tpu.trainer.metrics import IkrMetric
from musicnlp_tpu.utils import checkpoint as ckpt
from musicnlp_tpu.utils.rng import train_key
from musicnlp_tpu.vocab import MusicTokenizer

__all__ = ['TrainArgs', 'Trainer', 'get_model_n_tokenizer', 'get_all_setup']

logger = logging.getLogger(__name__)


@dataclass
class TrainArgs:
    """Per-model/size presets mirroring the reference table (train.py:63-160)."""
    batch_size: int = 32
    learning_rate: float = 3e-4
    weight_decay: float = 1e-2
    lr_scheduler_type: str = 'cosine'      # cosine | constant
    num_train_epochs: int = 64
    warmup_ratio: float = 0.1
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_epsilon: float = 1e-8
    max_grad_norm: float = 1.0
    gradient_accumulation_steps: int = 1
    eval_batch_size: Optional[int] = None
    logging_steps: int = 1
    save_per_epoch: bool = True
    # Save a checkpoint only every N epochs (the last epoch always saves).
    # Pulling a base-size params+opt pytree off a tunneled chip costs ~50 s
    # per save, so per-epoch saving can dominate small-corpus runs; best-
    # model tracking then picks among the saved epochs only.
    save_every: int = 1
    # Keep at most N epoch checkpoints on disk (HF save_total_limit
    # semantics; the best-eval-loss checkpoint is always retained on top of
    # the N most recent).  None/0 = keep everything.  A 256-epoch run at
    # base size writes ~1.4 GB/checkpoint -- unrotated it fills the disk.
    save_total_limit: Optional[int] = None
    load_best_model_at_end: bool = True    # on eval_loss (reference train.py:188)
    seed: int = 77
    n_seg: int = 1                         # >1: segment-scan TF-XL training

    presets = {
        'transf-xl': {
            'debug': dict(batch_size=2, learning_rate=1e-3, weight_decay=0.0,
                          lr_scheduler_type='constant', num_train_epochs=64),
            'debug-large': dict(batch_size=8, learning_rate=1e-3, weight_decay=0.0,
                                lr_scheduler_type='constant', num_train_epochs=16),
            'tiny': dict(batch_size=32, learning_rate=3e-4, weight_decay=1e-2,
                         lr_scheduler_type='cosine', num_train_epochs=64, warmup_ratio=0.1),
            'small': dict(batch_size=32, learning_rate=3e-4, weight_decay=1e-2,
                          lr_scheduler_type='cosine', num_train_epochs=64, warmup_ratio=0.1),
            'base': dict(batch_size=32, learning_rate=3e-4, weight_decay=1e-2,
                         lr_scheduler_type='cosine', num_train_epochs=64, warmup_ratio=0.1),
            'large': dict(batch_size=32, learning_rate=3e-4, weight_decay=1e-2,
                          lr_scheduler_type='cosine', num_train_epochs=64, warmup_ratio=0.1),
        },
        'reformer': {
            'debug': dict(batch_size=8, learning_rate=1e-3, weight_decay=0.0,
                          lr_scheduler_type='constant', num_train_epochs=32),
            'debug-large': dict(batch_size=8, learning_rate=1e-3, weight_decay=0.0,
                                lr_scheduler_type='constant', num_train_epochs=32),
            'tiny': dict(batch_size=32, learning_rate=3e-4, weight_decay=1e-2,
                         lr_scheduler_type='cosine', num_train_epochs=32, warmup_ratio=0.1),
            'small': dict(batch_size=32, learning_rate=3e-4, weight_decay=1e-2,
                          lr_scheduler_type='cosine', num_train_epochs=64, warmup_ratio=0.1),
            'base': dict(batch_size=32, learning_rate=3e-4, weight_decay=1e-2,
                         lr_scheduler_type='cosine', num_train_epochs=64, warmup_ratio=0.1),
            'large': dict(batch_size=32, learning_rate=3e-4, weight_decay=1e-2,
                          lr_scheduler_type='cosine', num_train_epochs=64, warmup_ratio=0.1),
        },
    }

    @classmethod
    def from_preset(cls, model_name: str, model_size: str, **overrides) -> 'TrainArgs':
        d = dict(cls.presets[model_name][model_size])
        d.update(overrides)
        return cls(**d)


def make_optimizer(args: TrainArgs, total_steps: int):
    """AdamW + warmup-cosine (or constant) schedule + global-norm clip.

    `total_steps` counts micro-batches; with gradient accumulation the inner
    schedule only advances once per k micro-batches (optax.MultiSteps), so the
    schedule is built over optimizer steps = total_steps // k.
    """
    if args.gradient_accumulation_steps > 1:
        total_steps = max(1, total_steps // args.gradient_accumulation_steps)
    if args.lr_scheduler_type == 'cosine':
        warmup = max(1, int(total_steps * args.warmup_ratio))
        sched = optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=args.learning_rate,
            warmup_steps=warmup, decay_steps=max(total_steps, warmup + 1),
            end_value=0.0)
    else:
        sched = optax.constant_schedule(args.learning_rate)
    tx = optax.chain(
        optax.clip_by_global_norm(args.max_grad_norm),
        optax.adamw(sched, b1=args.adam_beta1, b2=args.adam_beta2,
                    eps=args.adam_epsilon, weight_decay=args.weight_decay),
    )
    if args.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, args.gradient_accumulation_steps)
    return tx, sched


class Trainer:
    """Epoch loop with per-step metrics, per-epoch eval + checkpoint,
    best-model-at-end on eval_loss."""

    def __init__(
            self, model: TransfoXL, tokenizer: MusicTokenizer,
            train_dataset, eval_dataset=None, args: TrainArgs = None,
            out_dir: str = None, mesh=None, n_model: int = 1,
            ikr_mode: str = 'vanilla', host_shard=None,
    ):
        self.model = model
        self.tokenizer = tokenizer
        self.train_dataset = train_dataset
        self.eval_dataset = eval_dataset
        self.args = args or TrainArgs()
        self.out_dir = out_dir or os.path.join('models', f'run_{int(time.time())}')
        self._saved_ckpts: List[str] = []
        self.mesh = mesh if mesh is not None else mesh_lib.make_mesh(n_model=n_model)
        # vocab-row-sharded embedding/head (262k tier): the model needs the
        # mesh for its shard_map CE, and params place with vocab-sharded specs
        self._shard_vocab = bool(getattr(model.cfg, 'shard_vocab', False))
        if self._shard_vocab and getattr(model, 'mesh', None) is None:
            model.mesh = self.mesh
        # multi-host input sharding: each process loads only its slice of
        # every global batch (reference is single-process; SURVEY.md 2.2's
        # TPU-native equivalent is per-host loading + one GSPMD program).
        # Auto-detected from jax.process_count(); override for tests.
        self.host_shard = host_shard if host_shard is not None \
            else mesh_lib.host_shard()
        # multi-host runs write logs/checkpoints from process 0 only (the
        # out_dir is one shared FS on a pod); every process keeps the same
        # in-memory bookkeeping so best-model selection stays in lockstep
        self._is_main = jax.process_index() == 0

        steps_per_epoch = max(1, len(train_dataset) // self.args.batch_size)
        self.steps_per_epoch = steps_per_epoch
        total = steps_per_epoch * self.args.num_train_epochs
        self.tx, self.lr_sched = make_optimizer(self.args, total)

        self.ikr = IkrMetric(tokenizer, mode=ikr_mode)
        self._id_pc = jnp.asarray(self.ikr.id_pitch_class)
        self._inkey = jnp.asarray(self.ikr.key_inkey_mask)
        self._id2key = jnp.asarray(self.ikr.id2key_ordinal)
        self._build_steps()

        self.log_path = os.path.join(self.out_dir, 'train_log.jsonl')
        # rbg keys: dropout masks via the TPU hardware RNG (utils/rng.py;
        # threefry masks alone measured 62 ms/step at base/1024)
        self._rng = train_key(self.args.seed)

    # ------------------------------------------------------------------ setup
    def init_state(self, rng=None) -> Tuple[Any, Any]:
        """Init (params, opt_state), placed onto the mesh with TP shardings."""
        params = self.model.init(rng if rng is not None else self._rng)
        specs = mesh_lib.param_specs(params, shard_vocab=self._shard_vocab)
        params = mesh_lib.shard_pytree(params, specs, self.mesh)
        opt_state = jax.jit(
            self.tx.init,
            out_shardings=None)(params)
        return params, opt_state

    def _metrics_in_step(self, mets, labels, key_scores):
        preds = mets.pop('preds')
        valid = labels[:, 1:] != PT_LOSS_PAD
        key_ordinal = None
        if self.ikr.mode == 'ins-key':
            # key read from the 3rd token (the inserted Key_* token,
            # reference metrics.py:60-66)
            key_ids = jnp.clip(labels[:, 2], 0, self._id2key.shape[0] - 1)
            key_ordinal = jnp.maximum(self._id2key[key_ids], 0)
        mets['ikr'] = ikr_from_ids(
            preds[:, :-1], key_scores, self._id_pc, self._inkey, valid=valid,
            key_ordinal=key_ordinal)
        return mets

    def _build_steps(self):
        model, args = self.model, self.args
        from jax.sharding import NamedSharding
        multislice = mesh_lib.REPLICA_AXIS in self.mesh.axis_names
        self._bspecs = mesh_lib.batch_specs(multislice=multislice)
        bspec = {k: NamedSharding(self.mesh, v)
                 for k, v in self._bspecs.items()}

        def train_step(params, opt_state, batch, rng):
            def loss_fn(p):
                loss, mets = model.loss(
                    p, batch['input_ids'], batch['labels'], rng=rng,
                    deterministic=False, n_seg=args.n_seg)
                return loss, mets
            (loss, mets), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            mets = self._metrics_in_step(mets, batch['labels'], batch['key_scores'])
            mets['loss'] = loss
            mets['grad_norm'] = optax.global_norm(grads)
            return params, opt_state, mets

        def eval_step(params, batch):
            loss, mets = model.loss(params, batch['input_ids'], batch['labels'],
                                    deterministic=True, n_seg=args.n_seg)
            mets = self._metrics_in_step(mets, batch['labels'], batch['key_scores'])
            mets['loss'] = loss
            return mets

        self.train_step = jax.jit(train_step, donate_argnums=(0, 1),
                                  in_shardings=(None, None, bspec, None))
        self.eval_step = jax.jit(eval_step, in_shardings=(None, bspec))

    # ------------------------------------------------------------------ loops
    def _log(self, record: Dict):
        if not self._is_main:
            return
        os.makedirs(self.out_dir, exist_ok=True)
        with open(self.log_path, 'a') as f:
            f.write(json.dumps({k: (float(v) if hasattr(v, 'item') else v)
                                for k, v in record.items()}) + '\n')

    def train(self, params=None, opt_state=None,
              resume_from: Optional[str] = None) -> Dict[str, Any]:
        """Run the epoch loop.  `resume_from` restores params + optimizer
        state + epoch counter from an epoch checkpoint dir (crash-tolerant
        resume; reference relies on HF Trainer's checkpoint-resume)."""
        args = self.args
        start_epoch = 0
        if self._is_main and os.path.isdir(self.out_dir):
            # a kill between save_pytree and the atomic rename strands a
            # full-size checkpoint-ep*.tmp that rotation never adopts (the
            # resume scan skips non-canonical names by design) -- sweep them
            for d in os.listdir(self.out_dir):
                if d.startswith('checkpoint-ep') and d.endswith('.tmp'):
                    shutil.rmtree(os.path.join(self.out_dir, d),
                                  ignore_errors=True)
        if params is None:
            params, opt_state = self.init_state()
        if resume_from is not None:
            params = ckpt.restore_pytree(
                os.path.join(resume_from, 'params'), jax.device_get(params))
            params = mesh_lib.shard_pytree(
                params, mesh_lib.param_specs(params, shard_vocab=self._shard_vocab), self.mesh)
            opt_state = ckpt.restore_pytree(
                os.path.join(resume_from, 'opt_state'),
                jax.device_get(opt_state))
            meta = ckpt.load_meta(os.path.join(resume_from, 'state.json'))
            start_epoch = int(meta['epoch']) + 1
            self._rng = train_key(args.seed + 104729 * start_epoch)
            # adopt the crashed run's leftover epoch checkpoints so rotation
            # prunes them too -- otherwise save_total_limit only bounds the
            # new saves and the old pile keeps the disk full
            import re
            old = sorted(
                (int(m.group(1)), os.path.join(self.out_dir, d))
                for d in os.listdir(self.out_dir)
                if (m := re.fullmatch(r'checkpoint-ep(\d+)', d))
                and os.path.isdir(os.path.join(self.out_dir, d)))
            self._saved_ckpts = [p for _, p in old]
        best_loss, best_path = float('inf'), None
        global_step = start_epoch * self.steps_per_epoch
        history: List[Dict] = []
        for epoch in range(start_epoch, args.num_train_epochs):
            if hasattr(self.train_dataset, 'resample'):
                self.train_dataset.resample()  # proportional-mixing per-epoch
            t_ep = time.time()
            n_tok_ep = 0
            from musicnlp_tpu.utils.prefetch import prefetch
            bkw = dict(shard=self.host_shard) if self.host_shard else {}
            for batch in prefetch(self.train_dataset.batches(
                    args.batch_size, shuffle=True, seed=args.seed + epoch,
                    **bkw)):
                self._rng, r = jax.random.split(self._rng)
                # count host-side: forcing device scalars every step would
                # serialize dispatch (the device runs async)
                n_tok_ep += int((np.asarray(batch['labels']) != PT_LOSS_PAD).sum())
                batch = mesh_lib.make_global_batch(batch, self.mesh,
                                                   self._bspecs)
                params, opt_state, mets = self.train_step(params, opt_state, batch, r)
                global_step += 1
                if global_step % args.logging_steps == 0:
                    # the schedule advances once per optimizer step (= every
                    # gradient_accumulation_steps micro-batches)
                    opt_step = global_step // args.gradient_accumulation_steps
                    rec = dict(step=global_step, epoch=epoch,
                               lr=float(self.lr_sched(opt_step)),
                               **{k: float(v) for k, v in mets.items()})
                    self._log(rec)
                    logger.info(
                        'step %d ep %d | loss %.4f acc %.4f ikr %.4f lr %.2e',
                        global_step, epoch, rec['loss'], rec['ntp_acc'],
                        rec['ikr'], rec['lr'])
            dt = time.time() - t_ep
            if self.host_shard:
                # the local loop saw only this host's 1/nproc slice of every
                # global batch; sum the real non-pad counts across hosts so
                # the logged rate is the GLOBAL step throughput
                from jax.experimental import multihost_utils
                n_tok_ep = int(np.sum(multihost_utils.process_allgather(
                    np.int64(n_tok_ep))))
            ep_rec = dict(epoch=epoch, train_tokens_per_sec=n_tok_ep / max(dt, 1e-9))
            logger.info('epoch %d done: %.0f tokens/sec', epoch,
                        ep_rec['train_tokens_per_sec'])
            do_save = args.save_per_epoch and (
                (epoch + 1) % max(args.save_every, 1) == 0
                or epoch == args.num_train_epochs - 1)
            if self.eval_dataset is not None:
                ev = self.evaluate(params)
                ep_rec.update({f'eval_{k}': v for k, v in ev.items()})
                if do_save:
                    path = self._save_checkpoint(epoch, params, opt_state)
                    if ev['loss'] < best_loss:
                        best_loss, best_path = ev['loss'], path
                    self._rotate_checkpoints(best_path)
            elif do_save:
                self._save_checkpoint(epoch, params, opt_state)
                self._rotate_checkpoints(best_path)
            self._log(ep_rec)
            history.append(ep_rec)
        if args.load_best_model_at_end and best_path is not None:
            params = ckpt.restore_pytree(os.path.join(best_path, 'params'),
                                         jax.device_get(params))
            params = mesh_lib.shard_pytree(
                params, mesh_lib.param_specs(params, shard_vocab=self._shard_vocab), self.mesh)
        if self._is_main:
            final = ckpt.save_pytree(os.path.join(self.out_dir, 'trained'),
                                     params)
            ckpt.save_meta(os.path.join(self.out_dir, 'meta.json'), dict(
                model_name=_model_name(self.model),
                config=asdict_config(self.model.cfg),
                train_args=asdict(self.args),
                tokenizer=describe_tokenizer(self.tokenizer, self.out_dir),
                best_eval_loss=best_loss, final_checkpoint=final))
        mesh_lib.barrier('trained')
        return dict(params=params, opt_state=opt_state, history=history,
                    best_eval_loss=best_loss)

    def _save_checkpoint(self, epoch: int, params, opt_state) -> str:
        """Epoch checkpoint dir with params + optimizer state + counters.
        Process 0 writes; the barrier keeps other hosts from reading (e.g.
        the best-model restore) before the files are complete.

        The directory appears ATOMICALLY (written as `.tmp`, renamed when
        complete): a save interrupted by a crash/kill can never leave a
        half-written `checkpoint-ep*` for resume/rotation/`load_trained`
        to trip over (a round-5 session was killed mid-save and the next
        resume picked the empty dir)."""
        d = os.path.join(self.out_dir, f'checkpoint-ep{epoch}')
        if self._is_main:
            tmp = d + '.tmp'
            shutil.rmtree(tmp, ignore_errors=True)
            ckpt.save_pytree(os.path.join(tmp, 'params'), params)
            ckpt.save_pytree(os.path.join(tmp, 'opt_state'), opt_state)
            ckpt.save_meta(os.path.join(tmp, 'state.json'), dict(epoch=epoch))
            shutil.rmtree(d, ignore_errors=True)
            os.rename(tmp, d)
        mesh_lib.barrier(f'ckpt-ep{epoch}')
        self._saved_ckpts.append(d)
        return d

    def _rotate_checkpoints(self, best_path: Optional[str]) -> None:
        """Prune to the save_total_limit most recent epoch checkpoints,
        always additionally retaining the best-eval-loss one."""
        limit = self.args.save_total_limit
        if not limit:
            return
        keep = set(self._saved_ckpts[-limit:])
        if best_path:
            keep.add(best_path)
        for d in [p for p in self._saved_ckpts if p not in keep]:
            if self._is_main and os.path.isdir(d):
                shutil.rmtree(d)
            self._saved_ckpts.remove(d)

    def evaluate(self, params) -> Dict[str, float]:
        args = self.args
        bsz = args.eval_batch_size or args.batch_size
        tot: Dict[str, float] = {}
        n = 0.0
        for batch in self.eval_dataset.batches(bsz, shuffle=False, drop_last=False):
            n_real = len(batch['input_ids'])
            if n_real < bsz:   # pad the final partial batch to the fixed shape
                pad = bsz - n_real
                batch = {k: np.concatenate([v, np.repeat(v[-1:], pad, 0)])
                         for k, v in batch.items()}
                # padded rows must contribute nothing: all metrics reduce over
                # label-valid positions, so -100 labels (and zero key weight)
                # null them out exactly
                batch['labels'] = batch['labels'].copy()
                batch['labels'][n_real:] = PT_LOSS_PAD
                batch['key_scores'] = batch['key_scores'].copy()
                batch['key_scores'][n_real:] = 0.0
            # multi-host: every host loads the SAME full eval batch (no
            # shard= -- eval order is fixed), so each contributes its own
            # row slice to the global array; n_real stays the global count
            if self.host_shard:
                pi, nproc = self.host_shard
                assert len(batch['input_ids']) % nproc == 0, (
                    f'eval batch size {len(batch["input_ids"])} must divide '
                    f'by process_count {nproc}')
                per = len(batch['input_ids']) // nproc
                batch = {k: v[pi * per:(pi + 1) * per]
                         for k, v in batch.items()}
            batch = mesh_lib.make_global_batch(batch, self.mesh, self._bspecs)
            mets = self.eval_step(params, batch)
            for k in ('loss', 'ntp_acc', 'ikr'):
                tot[k] = tot.get(k, 0.0) + n_real * float(mets[k])
            n += n_real
        return {k: v / max(n, 1e-9) for k, v in tot.items()}


def asdict_config(cfg: TransfoXLConfig) -> Dict:
    from dataclasses import asdict as _as
    return _as(cfg)


def _model_name(model) -> str:
    return 'reformer' if type(model).__name__ == 'Reformer' else 'transf-xl'


def describe_tokenizer(tokenizer: MusicTokenizer, out_dir: str) -> Dict:
    """Persistable tokenizer identity (the reference's checkpoint registry
    records model+tokenizer per run, reference musicnlp/trainer/eval.py:32-95).

    Learned tokenizers (wordpiece/pairmerge) additionally write their trained
    unit table into `out_dir/tokenizer.json` so the checkpoint directory is
    self-contained; `rebuild_tokenizer` restores the exact tokenizer.
    """
    cls = type(tokenizer).__name__
    d = dict(pitch_kind=tokenizer.pitch_kind,
             precision=tokenizer.vocab.precision,
             model_max_length=tokenizer.model_max_length,
             vocab_size=tokenizer.vocab_size)
    if cls == 'WordPieceMusicTokenizer':
        d['scheme'] = 'wordpiece'
    elif cls == 'PairMergeTokenizer':
        d['scheme'] = 'pairmerge'
    else:
        d['scheme'] = 'vanilla'
        return d
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, 'tokenizer.json'), 'w') as f:
        json.dump(tokenizer.meta, f)
    d['tokenizer_file'] = 'tokenizer.json'
    return d


def rebuild_tokenizer(meta: Dict, out_dir: str) -> MusicTokenizer:
    """Inverse of `describe_tokenizer`: tokenizer identical to the trained one."""
    tk = meta.get('tokenizer')
    if tk is None:   # pre-identity checkpoints: the reference default
        return MusicTokenizer(pitch_kind='degree')
    scheme = tk['scheme']
    if scheme == 'vanilla':
        return MusicTokenizer(pitch_kind=tk['pitch_kind'],
                              precision=tk.get('precision', 5),
                              model_max_length=tk['model_max_length'])
    path = os.path.join(out_dir, tk['tokenizer_file'])
    if scheme == 'wordpiece':
        from musicnlp_tpu.trainer.wordpiece_tokenizer import WordPieceMusicTokenizer
        return WordPieceMusicTokenizer.from_file(
            path, model_max_length=tk['model_max_length'])
    assert scheme == 'pairmerge', scheme
    from musicnlp_tpu.trainer.pair_merge_tokenizer import PairMergeTokenizer
    return PairMergeTokenizer.from_file(
        path, model_max_length=tk['model_max_length'])


def get_model_n_tokenizer(
        model_name: str, model_size: str, vocab_size: int = None,
        pitch_kind: str = 'degree', max_length: int = None, model_config: Dict = None,
        tokenizer_scheme: str = 'vanilla', tokenizer_path: str = None,
) -> Tuple[Any, MusicTokenizer]:
    """Mirror of reference train.py:31-59 wiring; tokenizer scheme is
    vanilla | wordpiece | pairmerge (trained artifact loaded from
    `tokenizer_path`, reference train.py:31-47)."""
    if tokenizer_scheme == 'vanilla':
        tokenizer = MusicTokenizer(pitch_kind=pitch_kind)
    elif tokenizer_scheme == 'wordpiece':
        from musicnlp_tpu.trainer.wordpiece_tokenizer import WordPieceMusicTokenizer
        tokenizer = WordPieceMusicTokenizer.from_file(tokenizer_path)
    elif tokenizer_scheme == 'pairmerge':
        from musicnlp_tpu.trainer.pair_merge_tokenizer import PairMergeTokenizer
        tokenizer = PairMergeTokenizer.from_file(tokenizer_path)
    else:
        raise ValueError(f'Unknown tokenizer scheme {tokenizer_scheme!r}')
    if model_name == 'transf-xl':
        cfg = TransfoXLConfig.from_size(
            model_size, vocab_size or tokenizer.vocab_size,
            max_length=max_length, **(model_config or {}))
        model = TransfoXL(cfg)
    elif model_name == 'reformer':
        from musicnlp_tpu.models.reformer import Reformer, ReformerConfig
        cfg = ReformerConfig.from_size(
            model_size, vocab_size or tokenizer.vocab_size,
            max_length=max_length, **(model_config or {}))
        model = Reformer(cfg)
    else:
        raise ValueError(f'Unknown model {model_name!r}')
    tokenizer.model_max_length = model.cfg.max_length
    return model, tokenizer


def get_all_setup(
        model_name: str, model_size: str, train_dataset=None, eval_dataset=None,
        train_args: Dict = None, out_dir: str = None, n_model: int = 1,
        pitch_kind: str = 'degree', model_config: Dict = None,
) -> Trainer:
    """One-call wiring: tokenizer + model + datasets + Trainer
    (reference train.py:287-368)."""
    model, tokenizer = get_model_n_tokenizer(
        model_name, model_size, pitch_kind=pitch_kind, model_config=model_config)
    args = TrainArgs.from_preset(model_name, model_size, **(train_args or {}))
    return Trainer(model, tokenizer, train_dataset, eval_dataset, args=args,
                   out_dir=out_dir, n_model=n_model)


# --------------------------------------------------------------------- recipes
# The reference's published training recipes (reference generated-samples/
# README.md; trainer/train.py:474-591 __main__ configs; BASELINE.md).
RECIPES: Dict[str, Dict] = {
    # Reformer base, midi pitch, 8 epochs (POP909 + LMD subset)
    '22-04': dict(
        model_name='reformer', model_size='base', pitch_kind='midi',
        max_length=2048,
        train_args=dict(num_train_epochs=8, batch_size=32),
        augment=dict(random_crop=True, channel_mixup=True),
        generation=dict(strategy='sample', top_p=0.9),
    ),
    # TF-XL base, degree pitch, seq 1024 / mem 512, 128 epochs,
    # proportional mixing + key augmentation (the headline recipe)
    '22-11': dict(
        model_name='transf-xl', model_size='base', pitch_kind='degree',
        max_length=1024, model_config=dict(mem_len=512),
        train_args=dict(num_train_epochs=128, batch_size=21, weight_decay=0.1),
        augment=dict(random_crop=True, insert_key=True, pitch_shift=True,
                     channel_mixup=True),
        proportional_mixing_k=32768, ikr_mode='ins-key',
        generation=dict(strategy='sample', top_k=8),
    ),
    # TF-XL small, longer sequence (seq 2048 / mem 1024), top-k 8 sampling
    '22-12': dict(
        model_name='transf-xl', model_size='small', pitch_kind='degree',
        max_length=2048, model_config=dict(mem_len=1024),
        train_args=dict(num_train_epochs=128, batch_size=21, weight_decay=0.1),
        augment=dict(random_crop=True, insert_key=True, pitch_shift=True,
                     channel_mixup=True),
        proportional_mixing_k=32768, ikr_mode='ins-key',
        generation=dict(strategy='sample', top_k=8),
    ),
}


def setup_recipe(name: str, song_datasets, eval_datasets=None,
                 out_dir: str = None, n_model: int = 1,
                 train_args: Dict = None, overrides: Dict = None) -> Trainer:
    """Wire a named recipe end to end: model + tokenizer + augmented datasets
    (+ proportional mixing when the recipe uses it) + Trainer.

    overrides: shallow recipe-field overrides (e.g. model_size='small' to run
    the 22-11 recipe at a different size tier)."""
    from musicnlp_tpu.preprocess.dataset import (
        AugmentedDataset, ProportionMixingDataset, SongDataset,
    )
    r = dict(RECIPES[name], **(overrides or {}))
    model, tokenizer = get_model_n_tokenizer(
        r['model_name'], r['model_size'], pitch_kind=r['pitch_kind'],
        max_length=r['max_length'], model_config=r.get('model_config'))
    aug = dict(r['augment'])
    if isinstance(song_datasets, SongDataset):
        song_datasets = [song_datasets]
    trains = [AugmentedDataset(sd, tokenizer, dataset_split='train', **aug)
              for sd in song_datasets]
    k = r.get('proportional_mixing_k')
    train = (ProportionMixingDataset(trains, k=k) if (k and len(trains) > 1)
             else trains[0] if len(trains) == 1 else
             ProportionMixingDataset(trains, k=k or 10 ** 9))
    evald = None
    if eval_datasets is not None:
        if isinstance(eval_datasets, SongDataset):
            eval_datasets = [eval_datasets]
        aug_eval = {k_: v for k_, v in aug.items() if k_ != 'random_crop'}
        evald = AugmentedDataset(eval_datasets[0], tokenizer,
                                 random_crop=False, dataset_split='test',
                                 **aug_eval)
    args = TrainArgs.from_preset(r['model_name'], r['model_size'],
                                 **dict(r.get('train_args', {}),
                                        **(train_args or {})))
    return Trainer(model, tokenizer, train, evald, args=args, out_dir=out_dir,
                   n_model=n_model, ikr_mode=r.get('ikr_mode', 'vanilla'))
