#!/usr/bin/env bash
# Build script — the reference's build.sh analog (cmake -GNinja + pip
# install, build.sh:1-20). The TPU framework is pure Python + one small
# C++ runtime library, so "build" means: compile the native runtime,
# regenerate the gRPC stubs, and smoke-test the package import.
set -euo pipefail
cd "$(dirname "$0")"

echo "== native runtime (C++ threadpool/state-store/async-agent) =="
g++ -O2 -shared -fPIC -std=c++17 -pthread \
    humanoid_mujoco_tpu/native/runtime.cpp \
    -o humanoid_mujoco_tpu/native/libhmt_runtime.so
echo "   built humanoid_mujoco_tpu/native/libhmt_runtime.so"

if command -v protoc >/dev/null 2>&1; then
    echo "== gRPC stubs (agent/filter/direct protos) =="
    (cd humanoid_mujoco_tpu/grpc && bash gen.sh) || \
        echo "   (gen.sh skipped — generated *_pb2.py are checked in)"
fi

echo "== import smoke test =="
python - << 'EOF'
import humanoid_mujoco_tpu  # noqa: F401
from humanoid_mujoco_tpu.native import load
load()
print("   package + native runtime OK")
EOF

echo "== done. Run tests with: python -m pytest tests/ -q =="
