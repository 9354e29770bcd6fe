import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
jax.config.update('jax_compilation_cache_dir', os.path.expanduser('~/.cache/mygenerativerecommenders_tpu/xla'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
sys.path.insert(0, "/root/repo/benchmarks")
from bucket_bench import make_dataset
from mygenerativerecommenders_tpu.configs import resolve
from mygenerativerecommenders_tpu.configs.presets import get_preset
from mygenerativerecommenders_tpu.data.dataset import BatchLoader
from mygenerativerecommenders_tpu.models.model import build_model
from mygenerativerecommenders_tpu.train.optimizers import build_optimizer
from mygenerativerecommenders_tpu.train.task_retrieval import make_train_step
from mygenerativerecommenders_tpu.utils.features import seq_features_from_batch

cfg = get_preset("ml-20m-hstu-long"); cfg.data.batch_size = 32
resolve(cfg, cfg.data.expected_max_item_id)
ds = make_dataset(256, 1024, cfg.data.expected_max_item_id)
model = build_model(cfg)
rng = jax.random.PRNGKey(0)
loader = BatchLoader(ds, batch_size=32, shuffle=True, seed=1, buckets=[128, 256, 512, 1024])
batches = list(loader)
print("shapes:", sorted({b["ids"].shape for b in batches}))
probe = [b for b in batches if b["ids"].shape[1] == 128][0]
seq, _, _ = seq_features_from_batch(probe, cfg.model.gr_output_length + 1)
params = jax.jit(model.init)({"params": rng, "dropout": rng}, seq)
all_item_ids = np.sort(np.random.default_rng(0).choice(np.arange(1, cfg.data.expected_max_item_id + 1), size=cfg.data.expected_num_unique_items, replace=False)).astype(np.int32)
tx = build_optimizer(cfg.optimizer1, None, params, cfg.optimizer1.lr, 0.0)
opt = jax.jit(tx.init)(params)
step = make_train_step(model, cfg, all_item_ids)
db = jax.device_put(probe)
p, o, loss = step(params, opt, db, rng, cfg.optimizer1.lr, 0.0)
print("cap128 step ok, loss", float(loss))
