"""Host data-pipeline throughput benchmark (SURVEY.md §7.3 #5).

The device consumes ~90 img/s/chip for the e2e VCR train step (bench.py);
a v5e-8 host must therefore source ~720 img/s of decoded, transformed,
tokenized, collated batches. This measures what the host path actually
delivers on a realistic synthetic VCR workload:

  * images: 800x533 JPEG (VCR movie-frame class) decoded per item
  * 8 objects with polygon segms rasterized to 14x14
  * mixed-token question + 4 answers retokenized with tags per item
  * full transform chain (shortest-edge resize to 600/1000, flip,
    BGR255 normalize, FixPadding) + static-shape collate

Prints ONE JSON line:
  {"getitem_per_s", "loader_img_per_s": {threads: rate}, "collate_ms", ...}

Usage: python bench_host.py [--n 192] [--img 800x533]
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

WORDS = ("the a is are was on in at it he she they dog cat person car hat "
         "red blue left right because cold wearing ran doing what why how "
         "table chair window door street park tree house light dark happy "
         "sad looking holding standing sitting walking running talking").split()


def _write_vocab(d):
    toks = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    toks += sorted(set(WORDS)) + ["##s", "##ing", "##ed", "and", "?", "."]
    # wordpiece fragments so some words split
    path = os.path.join(d, "vocab.txt")
    with open(path, "w") as f:
        f.write("\n".join(toks))
    return path


def _make_fixture(d, n=192, w=800, h=533, n_obj=8, seed=0):
    from PIL import Image

    rng = np.random.default_rng(seed)
    img_dir = os.path.join(d, "img")
    os.makedirs(img_dir, exist_ok=True)
    # distinct images so decode isn't page-cache-trivially deduped
    n_imgs = min(n, 32)
    for i in range(n_imgs):
        arr = (rng.uniform(size=(h, w, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(img_dir, f"{i}.jpg"),
                                  quality=90)
    boxes, segms = [], []
    for k in range(n_obj):
        x1 = float(rng.integers(0, w - 60))
        y1 = float(rng.integers(0, h - 60))
        x2, y2 = x1 + 50, y1 + 50
        boxes.append([x1, y1, x2, y2, 0.9])
        # 8-point polygon inside the box
        pts = [[x1 + 5, y1 + 5], [x2 - 5, y1 + 5], [x2 - 5, y2 - 5],
               [x1 + 25, y2 - 2], [x1 + 5, y2 - 5], [x1 + 2, y1 + 25],
               [x1 + 10, y1 + 10], [x1 + 20, y1 + 4]]
        segms.append([pts])
    with open(os.path.join(d, "metadata0.json"), "w") as f:
        json.dump({"boxes": boxes, "segms": segms, "width": w, "height": h},
                  f)

    def sent(k):
        return [str(x) for x in rng.choice(WORDS, size=k)]

    with open(os.path.join(d, "ann.jsonl"), "w") as f:
        for i in range(n):
            row = {
                "annot_id": f"val-{i}",
                "img_fn": f"img/{i % n_imgs}.jpg",
                "metadata_fn": "metadata0.json",
                "objects": ["person", "person", "car", "dog", "person",
                            "chair", "cat", "person"][:n_obj],
                "question": sent(6) + [[0], "doing"] + sent(3) + ["?"],
                "answer_choices": [
                    [[0]] + sent(7), [[1], "and", [2]] + sent(5),
                    sent(9), [[3]] + sent(6)],
                "answer_label": int(rng.integers(0, 4)),
                "rationale_choices": [sent(10), sent(8), [[0]] + sent(9),
                                      sent(11)],
                "rationale_label": int(rng.integers(0, 4)),
            }
            f.write(json.dumps(row) + "\n")
    return d


def main():
    n = 192
    for i, a in enumerate(sys.argv):
        if a == "--n":
            n = int(sys.argv[i + 1])

    from vlbert_tpu.data.datasets.vcr import VCRDataset, make_vcr_collate
    from vlbert_tpu.data.loader import DataLoader
    from vlbert_tpu.data.tokenization import BertTokenizer
    from vlbert_tpu.data.transforms import build_transforms
    from vlbert_tpu.utils.config import default_config

    cfg = default_config("vcr")
    # the v5e-tuned configs ship TPU.RESIZE_IMPL='cv2' (5x faster host
    # resize, <=1 LSB mean divergence); measure that deployment path by
    # default, '--resize pil' for the exact-parity chain
    resize_impl = "cv2"
    for i, a in enumerate(sys.argv):
        if a == "--resize":
            if i + 1 >= len(sys.argv) or sys.argv[i + 1] not in ("pil",
                                                                 "cv2"):
                raise SystemExit("--resize takes 'pil' or 'cv2'")
            resize_impl = sys.argv[i + 1]
    cfg.TPU.RESIZE_IMPL = resize_impl
    tmp = tempfile.mkdtemp(prefix="vlbert_hostbench_")
    tok = BertTokenizer(_write_vocab(tmp))
    _make_fixture(tmp, n=n)
    collate = make_vcr_collate(tok, max_text=80, max_boxes=16)

    out = {
        "metric": "host VCR pipeline throughput (decode+transform+"
                  "tokenize+rasterize+collate)",
        "device_train_img_per_s_chip": 90.5,
        "unit": "img/s",
        # worker scaling is only meaningful with >1 core; TPU-VM hosts have
        # 100-200+ vCPUs, so getitem_per_s x cores is the projected ceiling
        "host_cpus": os.cpu_count(),
    }
    for norm_mode in ("host_float32", "device_uint8"):
        transform = build_transforms(cfg, "train",
                                     rng=np.random.default_rng(0),
                                     device_norm=norm_mode == "device_uint8")
        ds = VCRDataset(os.path.join(tmp, "ann.jsonl"), "train", tmp, tmp,
                        tokenizer=tok, transform=transform, task="Q2A",
                        add_image_as_a_box=True, mask_size=(14, 14),
                        seq_len=64, ignore_db_cache=True)

        # single-thread __getitem__
        _ = ds[0]  # warm imports/caches
        t0 = time.time()
        samples = [ds[i] for i in range(min(n, 64))]
        getitem_per_s = min(n, 64) / (time.time() - t0)

        # collate cost
        t0 = time.time()
        for i in range(0, len(samples) - 3, 4):
            collate(samples[i:i + 4])
        collate_ms = (time.time() - t0) / (len(samples) // 4) * 1e3

        # end-to-end loader rates by worker count
        loader_rates = {}
        for workers in (0, 4, 8, 16):
            dl = DataLoader(ds, batch_size=4, collate_fn=collate,
                            shuffle=True, num_threads=max(workers, 4),
                            num_workers=workers, prefetch=4)
            it = iter(dl)
            next(it)  # warm
            t0 = time.time()
            cnt = 1
            for _ in it:
                cnt += 1
            loader_rates[workers] = round(cnt * 4 / (time.time() - t0), 1)
            dl.shutdown()

        out[norm_mode] = {
            "getitem_per_s": round(getitem_per_s, 1),
            "collate_ms_per_b4": round(collate_ms, 2),
            "loader_img_per_s_by_workers": loader_rates,
        }

    # ---- end-to-end feed-rate proof (VERDICT r2 next #5): the REAL loader
    # pool + collate + shard_batch onto an 8-virtual-device CPU mesh,
    # consumed at the device's measured step budget. Reports the sustained
    # rate and the Speedometer Data-phase fraction — host keeps the chip
    # fed iff data_fraction ~ 0 and sustained >= demand.
    budget_ms = 40.0                      # measured B=4 train step (bench.py)
    for i, a in enumerate(sys.argv):
        if a == "--budget-ms":
            budget_ms = float(sys.argv[i + 1])
    demand_img_per_s = 4 / (budget_ms / 1e3)

    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=8")
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    from vlbert_tpu.parallel.mesh import make_mesh, shard_batch

    mesh = make_mesh()
    transform = build_transforms(cfg, "train", rng=np.random.default_rng(0),
                                 device_norm=True)
    ds = VCRDataset(os.path.join(tmp, "ann.jsonl"), "train", tmp, tmp,
                    tokenizer=tok, transform=transform, task="Q2A",
                    add_image_as_a_box=True, mask_size=(14, 14),
                    seq_len=64, ignore_db_cache=True)
    workers = min(16, os.cpu_count() or 4)
    dl = DataLoader(ds, batch_size=8, collate_fn=collate, shuffle=True,
                    num_threads=4, num_workers=workers, prefetch=4)
    with mesh:
        # pass 1 — UNPACED drain: the host's true sustained rate is
        # imgs / wall with the consumer never sleeping. (A paced consumer
        # lets workers run ahead during the sleep, and imgs/(t_wait+t_shard)
        # then equals R*D/(D-R), so "sustained >= demand" would pass at
        # R >= D/2 — half the real requirement.)
        it = iter(dl)
        first = shard_batch(next(it), mesh)          # warm pool + compile
        jax.block_until_ready([x for x in jax.tree_util.tree_leaves(first)
                               if x is not None][0])
        imgs = 0
        t0 = time.time()
        for batch in it:
            shard_batch(batch, mesh)
            imgs += 8
        sustained = imgs / max(time.time() - t0, 1e-9)

        # pass 2 — PACED at the device budget: what Speedometer's
        # Data-phase would report during a real run
        it = iter(dl)
        next(it)                                     # re-warm the pool
        t_wait = t_shard = 0.0
        t_all = time.time()
        t0 = time.time()
        for batch in it:
            t_wait += time.time() - t0
            ts = time.time()
            shard_batch(batch, mesh)
            t_shard += time.time() - ts
            time.sleep(budget_ms / 1e3 * 2)   # 8 imgs = 2 x B=4 steps
            t0 = time.time()
        total = time.time() - t_all
    dl.shutdown()
    n_cpus = os.cpu_count() or 1
    out["feed_rate"] = {
        "workers": workers,
        "device_budget_ms_per_b4_step": budget_ms,
        "device_demand_img_per_s": round(demand_img_per_s, 1),
        "host_sustained_img_per_s": round(sustained, 1),
        "data_phase_fraction": round((t_wait + t_shard) / total, 4),
        "keeps_chip_fed": sustained >= demand_img_per_s,
        # this container exposes few vCPUs; a TPU-VM host has 100-240.
        # the pipeline is embarrassingly parallel per sample (the pool maps
        # whole batches), so demand/percore = cores needed per chip
        "host_cpus_here": n_cpus,
        "per_core_img_per_s": round(sustained / n_cpus, 1),
        "projected_cores_needed_per_chip": round(
            demand_img_per_s / max(sustained / n_cpus, 1e-9), 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
