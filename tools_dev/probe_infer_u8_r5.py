import sys, json
sys.path.insert(0, "/root/repo")
import bench
out = bench._measure_infer()
print(json.dumps(out), flush=True)
