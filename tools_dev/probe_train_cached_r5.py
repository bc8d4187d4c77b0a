import sys, json
sys.path.insert(0, "/root/repo")
import bench
from mdir_tpu.models import initialize_model

model = initialize_model({
    "architecture": "cirnet", "cir_architecture": "resnet101",
    "local_whitening": False, "pooling": "gem", "regional": False,
    "whitening": False, "pretrained": False})
rate, res_rate, tflops, dtype, roof = bench._measure_train_step(model)
print(json.dumps({"train_tuples_per_sec": round(rate, 2),
                  "train_resident_tuples_per_sec": round(res_rate, 2),
                  "dtype": dtype, **roof}), flush=True)
