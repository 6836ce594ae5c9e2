"""Dataset catalog tables (reference datasets.py:795-811)."""

NUM_CLASSES = {
    "audioset": 527,
    "audioset-bal": 527,
    "audioset-bal-orig": 527,
    "vggsound": 310,
    "avsbench_avss": 71,
    "avsbench_s4": 2,
    "avsbench_ms3": 2,
    "music_solo": 11,
    "music_solo21": 21,
}

MULTI_CLASS_DBS = {
    "audioset": True,
    "audioset-bal": True,
    "audioset-bal-orig": True,
    "vggsound": False,
}


def num_classes(dataset: str) -> int:
    return NUM_CLASSES[dataset]


def is_multi_label(dataset: str) -> bool:
    return MULTI_CLASS_DBS.get(dataset, False)
