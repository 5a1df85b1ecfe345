"""Generate the shipped config grid.

Reproduces the reference's config surface (SURVEY §2 L0: configs/base/
{resnet18,vit_tiny}/{scratch,mean_teacher,fixmatch,cps,reco,stpp}.yaml ×
configs/bench/{ludb,qtdb,isp,zhejiang}/{1over2..1over16}.yaml +
cross_domain/merged.yaml) with the same YAML schema, retargeted at TPU:
``device: tpu``, ``precision: bf16`` (the ``use_amp`` knob is still
accepted), and a ``parallel`` section for the mesh.

Run: ``python tools/gen_configs.py`` (idempotent, writes under configs/).
"""

import os

import yaml

ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "configs")

FILL = "<FILL IN>"

BACKBONES = {
    "resnet18": {
        "backbone": {
            "resnet18": {
                "num_leads": 1,
                "num_stages": 4,
                "out_indices": [0, 1, 2, 3],
                "dilations": [1, 1, 1, 1],
                "strides": [1, 2, 2, 2],
                "deep_stem": False,
                "avg_down": False,
                "contract_dilation": False,
            }
        },
        "head_in": 512,
    },
    "vit_tiny": {
        "backbone": {
            "vit_tiny": {
                "seq_len": 2500,
                "patch_size": 25,
                "num_leads": 1,
                "fp16_enabled": True,
            }
        },
        "head_in": 192,
    },
}

STRONG_AUG = [
    {"RandAugment": {
        "ops": [
            {"AmplitudeScaling": {"sigma": 0.5}},
            {"AdaptivePowerlineNoise": {"fs": 250}},
            {"RandomPartialWhiteNoise": {"amplitude": 1, "ratio": 0.5}},
            {"RandomPartialSineNoise": {"amplitude": 1, "ratio": 0.5}},
        ],
        "level": 10,
        "num_layers": 3,
        "prob": 0.5,
    }},
]


def flagship_data_recipe(length: int = 2500) -> dict:
    """The FixMatch flagship pipeline blocks (filter / weak / strong /
    transforms) — the ONE definition every benchmark/validation tool
    merges over its dataset config, so recipes can't drift from the
    generated YAMLs (they did once: a benchmark shipped num_layers 2)."""
    return {
        "filter": [
            {"highpass_filter": {"fs": 250, "cutoff": 0.67}},
            {"lowpass_filter": {"fs": 250, "cutoff": 40}},
        ],
        "augmentations": [
            {"random_resize_crop": {"target_length": length,
                                    "scale_min": 0.5, "scale_max": 2.0}},
        ],
        "strong_augmentations": STRONG_AUG,
        "transforms": [
            {"standardize": {"axis": [-1, -2]}},
            {"to_tensor": {"dtype": "float"}},
        ],
    }

RECIPE = flagship_data_recipe(2500)

ALGO_TRAIN_EXTRAS = {
    "scratch": {},
    "mean_teacher": {"ema_decay": 0.99},
    "fixmatch": {"conf_thresh": 0.80},
    "cps": {},
    "reco": {
        "ema_decay": 0.99,
        "conf_thresh": 0.80,
        "eash_conf_thresh": 0.65,  # reference's typo key, kept for parity
        "hard_conf_thresh": 0.80,
        "contr_temp": 0.25,
        "contr_num_queries": 256,
        "contr_num_negatives": 512,
    },
    "stpp": {"ema_decay": 0.99},
}

ALGO_NAME = {"scratch": "base", "mean_teacher": "mean_teacher",
             "fixmatch": "fixmatch", "cps": "cps", "reco": "reco",
             "stpp": "stpp"}

SEMI = {"mean_teacher", "fixmatch", "cps", "reco", "stpp"}
STRONG = {"mean_teacher", "fixmatch", "reco"}  # algorithms using ecg_aug


def base_config(backbone: str, algo: str) -> dict:
    b = BACKBONES[backbone]
    dataset = {
        "ecg_dir": FILL,
        "label_dir": FILL,
        "index_dir": FILL,
    }
    if algo in SEMI:
        dataset["train_unlabeled_csv"] = FILL
    dataset.update({
        "train_labeled_csv": FILL,
        "valid_csv": FILL,
        "test_csv": FILL,
        "filename_col": "waveform",
        "label_filename_col": "label",
        "signal_length": 2500,
        "cache": True,            # cache the resample+filter prefix in RAM
        "device_augment": False,  # True = fuse augmentation into the step
        "filter": RECIPE["filter"],
        "augmentations": RECIPE["augmentations"],
    })
    if algo in STRONG:
        dataset["strong_augmentations"] = RECIPE["strong_augmentations"]
    dataset["transforms"] = RECIPE["transforms"]

    cfg = {
        "seed": 0,
        "output_dir": f"../exps/{backbone}/{algo}",
        "exp_name": FILL,
        "resume": None,
        "start_epoch": 0,
        "device": "tpu",
        "use_amp": True,        # accepted legacy knob;
        "precision": "bf16",    # native precision policy
        "algorithm": ALGO_NAME[algo],
        "mode": "scratch",
        "pretrained_backbone": None,
        "backbone": b["backbone"],
        "decode_head": {
            "FCNHead": {
                "in_channels": b["head_in"],
                "in_index": 3,
                "channels": 128,
                "num_convs": 1,
                "concat_input": False,
                "dropout_ratio": 0.1,
                "num_classes": 4,
                "align_corners": False,
            }
        },
        "dataset": dataset,
        "dataloader": {"batch_size": 16, "num_workers": 4,
                       "pin_memory": False},
        "train": {
            "epochs": 100,
            "scan_steps": 1,  # >1 = lax.scan multi-step dispatch
            "accum_iter": 1,
            "warmup_epochs": 10,
            "min_lr": 0.0001,
            "blr": None,
            "lr": 0.001,
            "weight_decay": 0.05,
            "max_norm": None,
            "layer_decay": None,
            "optimizer": "adamw",
            "optimizer_kwargs": {"betas": [0.9, 0.999]},
            "auxiliary_loss_weight": [0.4],
            **ALGO_TRAIN_EXTRAS[algo],
        },
        "metric": {
            "task": "segmentation",
            "compute_on_cpu": True,
            "sync_on_compute": False,
            "num_classes": 4,
            "include_background": True,
            "per_class": False,
            "input_format": "one-hot",
            "target_metrics": ["MeanIoU"],
        },
        "test": {"target_metric": "MeanIoU"},
        # mesh config (replaces the reference's ddp section; a legacy `ddp:`
        # block is still accepted and ignored apart from bookkeeping)
        "parallel": {"model_parallel": 1},
    }
    if algo == "reco":
        cfg["use_latent_projection"] = True
        cfg["projection_in_dim"] = b["head_in"]
        cfg["projection_out_dim"] = 128
    return cfg


BENCH = {
    "ludb": ("LUDB", "ludb",
             "Lobachevsky University Database: 200 12-lead records, 10 s @"
             " 500 Hz,\n# full P/QRS/T delineation"),
    "qtdb": ("QTDB", "qtdb",
             "QT Database: two-lead Holter excerpts with manually reviewed"
             "\n# delineation annotations"),
    "isp": ("ISP", "isp",
            "ISP dataset: single-lead records with delineation labels"),
    "zhejiang": ("Zhejiang", "zhejiang",
                 "Zhejiang dataset: 12-lead hospital ECGs with delineation"
                 " labels"),
    # beyond the reference's shipped grid: the paper's fifth in-domain
    # dataset (README.md:46-52 lists PTB-XL; no configs ship for it)
    "ptbxl": ("PTBXL", "ptbxl",
              "PTB-XL: large 12-lead clinical ECG corpus (delineation"
              " subset)"),
}


def write(path: str, data: dict, header: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(header)
        # flow style for leaf lists ([0.9, 0.999] etc.) — compact and
        # visually distinct from the reference's block-style YAML
        yaml.safe_dump(data, f, default_flow_style=None, sort_keys=False)


def main() -> None:
    for backbone in BACKBONES:
        for algo in ALGO_NAME:
            cfg = base_config(backbone, algo)
            write(
                os.path.join(ROOT, "base", backbone, f"{algo}.yaml"), cfg,
                f"# semi_seg_ecg_tpu base config: {backbone} / {algo}.\n"
                "# Fill the <FILL IN> dataset paths or merge a bench"
                " override (-o configs/bench/...).\n"
                "# TPU notes: `device: tpu` + `precision: bf16` replace the"
                " reference's cuda/AMP\n"
                "# pair (use_amp is still accepted); `parallel` sizes the"
                " device mesh (data axis\n"
                "# = remaining chips); add `dataset.device_augment: true`"
                " to fuse augmentation\n"
                "# into the jitted train step, and `train.scan_steps: K`"
                " for multi-step dispatch.\n"
                "# Regenerate this grid with tools/gen_configs.py.\n",
            )
    for key, (tag, d, blurb) in BENCH.items():
        for ratio in (2, 4, 8, 16):
            cfg = {
                "dataset": {
                    "ecg_dir": f"../data/{d}/ecg",
                    "label_dir": f"../data/{d}/label",
                    "index_dir": f"../index/{d}",
                    "train_unlabeled_csv": f"{tag}_train_unlabeled.csv",
                    "train_labeled_csv": f"{tag}_train_labeled_1over{ratio}.csv",
                    "valid_csv": f"{tag}_valid.csv",
                    "test_csv": f"{tag}_test.csv",
                },
                "exp_name": f"{key}/1over{ratio}",
            }
            write(
                os.path.join(ROOT, "bench", key, f"1over{ratio}.yaml"), cfg,
                f"# semi_seg_ecg_tpu bench override: {tag} with 1/{ratio}"
                " of the training set\n"
                "# kept labeled (the rest feeds the unlabeled branch of"
                " the semi-supervised\n"
                f"# algorithms). {blurb}.\n"
                "# Deep-merged on top of a configs/base/* recipe via `-o`;"
                " only the experiment\n"
                "# name and dataset locations live here. Expected tree:"
                " {ecg,label}/ pkl records\n"
                "# + index/ CSVs — see tools/prepare_data.py for WFDB"
                " conversion.\n",
            )
    merged = {
        "exp_name": "cross_domain/merged",
        "dataset": {
            "ecg_dir": "../data/merged/ecg",
            "label_dir": "../data/merged/label",
            "index_dir": "../index/merged",
            "train_unlabeled_csv": "Merged_train_unlabeled.csv",
            "train_labeled_csv": "Merged_train_labeled.csv",
            "valid_csv": "Merged_valid.csv",
            "test_csv": "Merged_test.csv",
        },
    }
    write(
        os.path.join(ROOT, "bench", "cross_domain", "merged.yaml"), merged,
        "# bench override: cross-domain Merged setting\n",
    )
    print("configs written under", ROOT)


if __name__ == "__main__":
    main()
