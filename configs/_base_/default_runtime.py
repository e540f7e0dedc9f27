# default runtime (reference configs/_base_/default_runtime.py)
weight = None  # path to model weight
resume = False  # resume training from weight
evaluate = True  # evaluate after each eval epoch
test_only = False

seed = None  # filled by default_config_parser with a shared random seed
save_path = "exp/default"
num_worker = 0
batch_size = 2  # global batch size (sharded across devices)
batch_size_val = 1
batch_size_test = 1

epoch = 2  # total data epochs
eval_epoch = 2  # outer epochs (data loops epoch // eval_epoch times)

mix_prob = 0.0
param_dicts = None

train = dict(type="Trainer")
test = dict(type="SemSegTester")

hooks = [
    dict(type="CheckpointLoader"),
    dict(type="IterationTimer", warmup_iter=2),
    dict(type="InformationWriter"),
    dict(type="SemSegEvaluator"),
    dict(type="CheckpointSaver", save_freq=None),
]
