"""Filter + Direct gRPC servers — the `filter_server` / `direct_server`
binary analogs.

The reference ships four server binaries; beyond agent_server /
ui_agent_server it wires the estimators and the direct optimizer onto
the wire (mjpc/grpc/filter_service.{h,cc}, direct_service.{h,cc};
binaries at grpc/CMakeLists.txt:281,312). Same shape here: thin
servicers over the in-process FilterService (serving/filtering.py) and
DirectService (direct/service.py), registered through grpc generic
method handlers like grpc_server.py.

Run:  python -m humanoid_mujoco_tpu.serving.estimation_servers \
          --service filter --task "Humanoid Cap Stand" --port 50052
      python -m humanoid_mujoco_tpu.serving.estimation_servers \
          --service direct --task ParticleFixed --port 50053
"""

from __future__ import annotations

import argparse
from concurrent import futures

import grpc
import numpy as np

from ..grpc import direct_pb2 as dpb
from ..grpc import filter_pb2 as fpb

FILTER_SERVICE = "humanoid_mujoco_tpu.filter.StateEstimation"
DIRECT_SERVICE = "humanoid_mujoco_tpu.direct.Direct"

FILTER_RPCS = {
    "Init": (fpb.InitRequest, fpb.Empty),
    "Reset": (fpb.Empty, fpb.Empty),
    "Update": (fpb.UpdateRequest, fpb.UpdateResponse),
    "State": (fpb.Empty, fpb.StateResponse),
    "Covariance": (fpb.Empty, fpb.CovarianceResponse),
    "Noise": (fpb.Empty, fpb.NoiseResponse),
}

DIRECT_RPCS = {
    "Init": (dpb.InitRequest, dpb.Empty),
    "Data": (dpb.DataRequest, dpb.Empty),
    "Settings": (dpb.SettingsRequest, dpb.SettingsResponse),
    "Optimize": (dpb.Empty, dpb.OptimizeResponse),
    "Cost": (dpb.Empty, dpb.CostResponse),
    "Status": (dpb.Empty, dpb.StatusResponse),
    "Reset": (dpb.Empty, dpb.Empty),
}


class FilterServicer:
    """Wraps one FilterService (filter_service.h analog)."""

    def __init__(self, service=None):
        self.service = service

    def _require(self, context):
        if self.service is None:
            context.abort(grpc.StatusCode.FAILED_PRECONDITION,
                          "call Init first")
        return self.service

    def Init(self, req, context):
        from ..tasks.registry import task_model
        from .filtering import FilterService
        m = task_model(req.task_id)
        self.service = FilterService(m)
        if req.qpos:
            self.service.init(
                np.asarray(req.qpos),
                np.asarray(req.qvel) if req.qvel else None)
        return fpb.Empty()

    def Reset(self, req, context):
        self._require(context).reset()
        return fpb.Empty()

    def Update(self, req, context):
        f = self._require(context)
        try:
            innov = f.update(np.asarray(req.ctrl),
                             np.asarray(req.sensor))
        except RuntimeError as e:
            context.abort(grpc.StatusCode.FAILED_PRECONDITION, str(e))
        return fpb.UpdateResponse(innovation=innov)

    def State(self, req, context):
        s = self._require(context).state()
        if s is None:
            context.abort(grpc.StatusCode.FAILED_PRECONDITION,
                          "filter not initialized")
        return fpb.StateResponse(qpos=s["qpos"].tolist(),
                                 qvel=s["qvel"].tolist())

    def Covariance(self, req, context):
        c = self._require(context).covariance()
        if c is None:
            context.abort(grpc.StatusCode.FAILED_PRECONDITION,
                          "filter not initialized")
        return fpb.CovarianceResponse(dimension=c.shape[0],
                                      covariance=c.ravel().tolist())

    def Noise(self, req, context):
        return fpb.NoiseResponse(
            sensor=self._require(context).noise().tolist())


class DirectServicer:
    """Wraps one DirectService (direct_service.h analog)."""

    def __init__(self, service=None):
        self.service = service

    def _require(self, context):
        if self.service is None:
            context.abort(grpc.StatusCode.FAILED_PRECONDITION,
                          "call Init first")
        return self.service

    def Init(self, req, context):
        from ..direct.service import DirectService
        from ..tasks.registry import task_model
        m = task_model(req.task_id)
        self.service = DirectService(
            m, configuration_length=req.configuration_length or 16,
            dt=req.dt or None)
        return dpb.Empty()

    def Data(self, req, context):
        d = self._require(context)
        try:
            d.set_data(np.asarray(req.qpos),
                       np.asarray(req.sensor) if req.sensor else None,
                       np.asarray(req.ctrl) if req.ctrl else None)
        except ValueError as e:
            context.abort(grpc.StatusCode.INVALID_ARGUMENT, str(e))
        return dpb.Empty()

    def Settings(self, req, context):
        d = self._require(context)
        d.set_settings(gn_iters=req.gn_iters,
                       estimate_mass=req.estimate_mass or None,
                       force_weight=req.force_weight,
                       regularization=req.regularization,
                       estimate_params=tuple(req.estimate_params))
        return dpb.SettingsResponse(**{
            k: (list(v) if k == "estimate_params" else v)
            for k, v in d.settings().items()})

    def Optimize(self, req, context):
        d = self._require(context)
        try:
            r = d.optimize()
        except RuntimeError as e:
            context.abort(grpc.StatusCode.FAILED_PRECONDITION, str(e))
        return dpb.OptimizeResponse(
            cost_initial=float(r.cost_initial),
            cost_final=float(r.cost),
            mass_scale=float(r.mass_scale),
            parameters=np.asarray(r.params).tolist(),
            qpos=np.asarray(r.qpos).ravel().tolist(),
            qvel=np.asarray(r.qvel).ravel().tolist())

    def Cost(self, req, context):
        d = self._require(context)
        try:
            return dpb.CostResponse(total=d.cost())
        except RuntimeError as e:
            context.abort(grpc.StatusCode.FAILED_PRECONDITION, str(e))

    def Status(self, req, context):
        return dpb.StatusResponse(**self._require(context).status())

    def Reset(self, req, context):
        self._require(context).reset()
        return dpb.Empty()


def _handlers(servicer, rpcs):
    return {
        name: grpc.unary_unary_rpc_method_handler(
            getattr(servicer, name),
            request_deserializer=req_t.FromString,
            response_serializer=lambda m: m.SerializeToString())
        for name, (req_t, _resp) in rpcs.items()
    }


def make_filter_server(service=None, port: int = 0,
                       host: str = "127.0.0.1"):
    """Build + bind (not started). Returns (server, bound_port)."""
    server = grpc.server(futures.ThreadPoolExecutor(max_workers=4))
    server.add_generic_rpc_handlers((grpc.method_handlers_generic_handler(
        FILTER_SERVICE, _handlers(FilterServicer(service), FILTER_RPCS)),))
    bound = server.add_insecure_port(f"{host}:{port}")
    return server, bound


def make_direct_server(service=None, port: int = 0,
                       host: str = "127.0.0.1"):
    server = grpc.server(futures.ThreadPoolExecutor(max_workers=4))
    server.add_generic_rpc_handlers((grpc.method_handlers_generic_handler(
        DIRECT_SERVICE, _handlers(DirectServicer(service), DIRECT_RPCS)),))
    bound = server.add_insecure_port(f"{host}:{port}")
    return server, bound


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--service", choices=("filter", "direct"),
                    required=True)
    ap.add_argument("--task", default="")
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--configuration-length", type=int, default=16)
    args = ap.parse_args(argv)

    service = None
    if args.task:
        from ..tasks.registry import task_model
        m = task_model(args.task)
        if args.service == "filter":
            from .filtering import FilterService
            service = FilterService(m)
        else:
            from ..direct.service import DirectService
            service = DirectService(
                m, configuration_length=args.configuration_length)
    make = (make_filter_server if args.service == "filter"
            else make_direct_server)
    server, port = make(service, args.port)
    server.start()
    print(f"{args.service} gRPC server on :{port}", flush=True)
    server.wait_for_termination()


if __name__ == "__main__":
    main()
