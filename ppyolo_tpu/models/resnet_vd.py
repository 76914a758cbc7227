"""ResNet-vd backbones (50 / 18) as functional NHWC modules.

Capability parity with reference model/resnet_vd.py: deep 3x3x3 stem
(resnet_vd.py:100-103), AvgPool-then-1x1 downsample shortcut
(ConvBlock, resnet_vd.py:29-31), downsample inside the 3x3 conv
(downsample_in3x3, resnet_vd.py:19-22), per-stage DCNv2 (dcn_v2_stages,
resnet_vd.py:111-127), stage freezing (freeze_at, resnet_vd.py:174-199) and
per-stage LR multipliers (lr_mult_list).

Param-tree paths mirror the reference torch state_dict
(e.g. ``stage2_0.conv1.conv.weight``) so checkpoint conversion is a pure
name/layout map; each conv also carries its Paddle layer name
(``res2a_branch2a`` ...) for the .pdparams converter
(1_ppyolo_2x_2pytorch.py:66-158).
"""
from __future__ import annotations

from typing import Any, Dict, List

import jax

from ..ops.module import Ctx, Module
from ..ops.conv import ConvNormAct
from ..ops.blocks import avg_pool2d, max_pool2d
from ..ops import stem_pallas


def _apply_stem(children, params, x, ctx: Ctx):
    """Deep stem (3x3x3 convs + maxpool, resnet_vd.py:100-108).  In eval
    mode on TPU bf16 the whole chain runs as ONE fused Pallas kernel
    (ops/stem_pallas.py) — the unfused convs are the backbone's worst
    MXU-utilization ops (docs/DESIGN.md per-conv table)."""
    mods = [children[f"stage1_conv1_{i}"] for i in (1, 2, 3)]
    ps = [params[f"stage1_conv1_{i}"] for i in (1, 2, 3)]
    if stem_pallas.stem_eligible(mods, x, ctx.train):
        return stem_pallas.apply_fused_stem(mods, ps, x)
    for m, p in zip(mods, ps):
        x = m.apply(p, x, ctx)
    return max_pool2d(x, 3, 2, 1)


def _init_children(children: Dict[str, Module], key: jax.Array) -> Dict[str, Any]:
    params = {}
    keys = jax.random.split(key, max(len(children), 1))
    for k, (name, mod) in zip(keys, children.items()):
        params[name] = mod.init(k)
    return params


def _policy_children(children: Dict[str, Module]) -> Dict[str, Any]:
    return {name: mod.param_policy() for name, mod in children.items()}


class _Composite(Module):
    """Shared plumbing for modules made of named conv children."""

    children_: Dict[str, Module]

    def init(self, key):
        return _init_children(self.children_, key)

    def param_policy(self):
        return _policy_children(self.children_)

    def iter_convs(self):
        for m in self.children_.values():
            if isinstance(m, ConvNormAct):
                yield m
            elif isinstance(m, _Composite):
                yield from m.iter_convs()

    def set_frozen(self, flag: bool = True):
        for c in self.iter_convs():
            c.frozen = flag


class ConvBlock(_Composite):
    """Bottleneck block with projection shortcut (resnet_vd.py:15-57)."""

    def __init__(self, prefix, in_c, filters, norm, lr, use_dcn=False, stride=2,
                 downsample_in3x3=True, is_first=False, paddle_name="",
                 freeze_norm=False, norm_decay=0.0):
        f1, f2, f3 = filters
        s1, s2 = (1, stride) if downsample_in3x3 else (stride, 1)
        self.is_first = is_first
        self.children_ = {
            "conv1": ConvNormAct(in_c, f1, 1, stride=s1, norm=norm, act="relu",
                                 lr_mult=lr, freeze_norm=freeze_norm,
                                 name=f"{prefix}.conv1"),
            "conv2": ConvNormAct(f1, f2, 3, stride=s2, norm=norm, act="relu",
                                 use_dcn=use_dcn, lr_mult=lr, freeze_norm=freeze_norm,
                                 name=f"{prefix}.conv2"),
            "conv3": ConvNormAct(f2, f3, 1, stride=1, norm=norm, act=None,
                                 lr_mult=lr, freeze_norm=freeze_norm,
                                 name=f"{prefix}.conv3"),
            "conv4": ConvNormAct(in_c, f3, 1, stride=1 if not is_first else stride,
                                 norm=norm, act=None, lr_mult=lr,
                                 freeze_norm=freeze_norm, name=f"{prefix}.conv4"),
        }
        for cname, pn in (("conv1", "branch2a"), ("conv2", "branch2b"),
                          ("conv3", "branch2c"), ("conv4", "branch1")):
            self.children_[cname].paddle_name = f"{paddle_name}_{pn}"

    def apply(self, params, x, ctx: Ctx):
        y = self.children_["conv1"].apply(params["conv1"], x, ctx)
        y = self.children_["conv2"].apply(params["conv2"], y, ctx)
        y = self.children_["conv3"].apply(params["conv3"], y, ctx)
        if not self.is_first:
            x = avg_pool2d(x, 2, 2)
        sc = self.children_["conv4"].apply(params["conv4"], x, ctx)
        return jax.nn.relu(y + sc)


class IdentityBlock(_Composite):
    """Bottleneck block with identity shortcut (resnet_vd.py:60-87)."""

    def __init__(self, prefix, in_c, filters, norm, lr, use_dcn=False,
                 paddle_name="", freeze_norm=False, norm_decay=0.0):
        f1, f2, f3 = filters
        self.children_ = {
            "conv1": ConvNormAct(in_c, f1, 1, norm=norm, act="relu", lr_mult=lr,
                                 freeze_norm=freeze_norm, name=f"{prefix}.conv1"),
            "conv2": ConvNormAct(f1, f2, 3, norm=norm, act="relu", use_dcn=use_dcn,
                                 lr_mult=lr, freeze_norm=freeze_norm,
                                 name=f"{prefix}.conv2"),
            "conv3": ConvNormAct(f2, f3, 1, norm=norm, act=None, lr_mult=lr,
                                 freeze_norm=freeze_norm, name=f"{prefix}.conv3"),
        }
        for cname, pn in (("conv1", "branch2a"), ("conv2", "branch2b"),
                          ("conv3", "branch2c")):
            self.children_[cname].paddle_name = f"{paddle_name}_{pn}"

    def apply(self, params, x, ctx: Ctx):
        y = self.children_["conv1"].apply(params["conv1"], x, ctx)
        y = self.children_["conv2"].apply(params["conv2"], y, ctx)
        y = self.children_["conv3"].apply(params["conv3"], y, ctx)
        return jax.nn.relu(y + x)


class BasicBlock(_Composite):
    """Two-conv residual block for ResNet18-vd (resnet_vd.py:224-267)."""

    def __init__(self, prefix, in_c, filters, norm, lr, stride=1, is_first=False,
                 use_dcn=False, paddle_name="", freeze_norm=False,
                 norm_decay=0.0):
        f1, f2 = filters
        self.is_first = is_first
        self.stride = stride
        self.children_ = {
            "conv1": ConvNormAct(in_c, f1, 3, stride=stride, norm=norm, act="relu",
                                 lr_mult=lr, freeze_norm=freeze_norm,
                                 name=f"{prefix}.conv1"),
            "conv2": ConvNormAct(f1, f2, 3, stride=1, norm=norm, act=None,
                                 use_dcn=use_dcn, lr_mult=lr,
                                 freeze_norm=freeze_norm,
                                 name=f"{prefix}.conv2"),
        }
        self.children_["conv1"].paddle_name = f"{paddle_name}_branch2a"
        self.children_["conv2"].paddle_name = f"{paddle_name}_branch2b"
        if stride == 2 or is_first:
            self.children_["conv3"] = ConvNormAct(
                in_c, f2, 1, stride=stride if is_first else 1, norm=norm, act=None,
                lr_mult=lr, freeze_norm=freeze_norm, name=f"{prefix}.conv3")
            self.children_["conv3"].paddle_name = f"{paddle_name}_branch1"

    def apply(self, params, x, ctx: Ctx):
        y = self.children_["conv1"].apply(params["conv1"], x, ctx)
        y = self.children_["conv2"].apply(params["conv2"], y, ctx)
        if self.stride == 2 or self.is_first:
            if not self.is_first:
                x = avg_pool2d(x, 2, 2)
            sc = self.children_["conv3"].apply(params["conv3"], x, ctx)
        else:
            sc = x
        return jax.nn.relu(y + sc)


_STAGE_LETTERS = "abcdefghijklmnopqrstuvwxyz"


class ResNet50Vd(_Composite):
    """Reference Resnet50Vd (resnet_vd.py:89-220), NHWC functional."""

    out_channels = {2: 256, 3: 512, 4: 1024, 5: 2048}

    def __init__(self, norm_type="bn", feature_maps=(3, 4, 5), dcn_v2_stages=(5,),
                 downsample_in3x3=True, freeze_at=0, freeze_norm=False,
                 norm_decay=0.0, lr_mult_list=(1.0, 1.0, 1.0, 1.0), prefix="backbone"):
        assert freeze_at in (0, 1, 2, 3, 4, 5)
        assert len(lr_mult_list) == 4
        self.feature_maps = list(feature_maps)
        self.freeze_at = freeze_at
        norm = norm_type
        ch: Dict[str, Module] = {}
        for i, (cin, cout) in enumerate([(3, 32), (32, 32), (32, 64)], start=1):
            m = ConvNormAct(cin, cout, 3, stride=2 if i == 1 else 1, norm=norm,
                            act="relu", freeze_norm=freeze_norm,
                            name=f"{prefix}.stage1_conv1_{i}")
            m.paddle_name = f"conv1_{i}"
            ch[f"stage1_conv1_{i}"] = m

        specs = [  # (stage, n_blocks, filters, in_c)
            (2, 3, [64, 64, 256], 64),
            (3, 4, [128, 128, 512], 256),
            (4, 6, [256, 256, 1024], 512),
            (5, 3, [512, 512, 2048], 1024),
        ]
        for stage, n, filters, in_c in specs:
            lr = lr_mult_list[stage - 2]
            use_dcn = stage in dcn_v2_stages
            for b in range(n):
                pn = f"res{stage}{_STAGE_LETTERS[b]}"
                name = f"stage{stage}_{b}"
                if b == 0:
                    ch[name] = ConvBlock(
                        f"{prefix}.{name}", in_c, filters, norm, lr,
                        use_dcn=use_dcn, stride=1 if stage == 2 else 2,
                        downsample_in3x3=downsample_in3x3, is_first=stage == 2,
                        paddle_name=pn, freeze_norm=freeze_norm)
                else:
                    ch[name] = IdentityBlock(
                        f"{prefix}.{name}", filters[2], filters, norm, lr,
                        use_dcn=use_dcn, paddle_name=pn, freeze_norm=freeze_norm)
            # in_c for next stage
        self.children_ = ch
        self._stage_blocks = {s: [f"stage{s}_{b}" for b in range(n)]
                              for s, n, _, _ in specs}
        if freeze_at:
            self.freeze()

    def freeze(self):
        """Mark stages <= freeze_at untrainable (resnet_vd.py:174-199)."""
        if self.freeze_at >= 1:
            for i in (1, 2, 3):
                self.children_[f"stage1_conv1_{i}"].frozen = True
        for s in (2, 3, 4, 5):
            if self.freeze_at >= s:
                for name in self._stage_blocks[s]:
                    self.children_[name].set_frozen(True)

    def apply(self, params, x, ctx: Ctx) -> List[jax.Array]:
        x = _apply_stem(self.children_, params, x, ctx)
        feats = {}
        for s in (2, 3, 4, 5):
            for name in self._stage_blocks[s]:
                x = self.children_[name].apply(params[name], x, ctx)
            feats[s] = x
        return [feats[s] for s in self.feature_maps]


class ResNet18Vd(_Composite):
    """Reference Resnet18Vd (resnet_vd.py:270-366), NHWC functional."""

    out_channels = {2: 64, 3: 128, 4: 256, 5: 512}

    def __init__(self, norm_type="bn", feature_maps=(4, 5), dcn_v2_stages=(),
                 freeze_at=0, freeze_norm=False, norm_decay=0.0,
                 lr_mult_list=(1.0, 1.0, 1.0, 1.0), prefix="backbone"):
        assert freeze_at in (0, 1, 2, 3, 4, 5)
        self.feature_maps = list(feature_maps)
        self.freeze_at = freeze_at
        norm = norm_type
        ch: Dict[str, Module] = {}
        for i, (cin, cout) in enumerate([(3, 32), (32, 32), (32, 64)], start=1):
            m = ConvNormAct(cin, cout, 3, stride=2 if i == 1 else 1, norm=norm,
                            act="relu", freeze_norm=freeze_norm,
                            name=f"{prefix}.stage1_conv1_{i}")
            m.paddle_name = f"conv1_{i}"
            ch[f"stage1_conv1_{i}"] = m
        specs = [  # (stage, filters, in_c, stride)
            (2, [64, 64], 64, 1),
            (3, [128, 128], 64, 2),
            (4, [256, 256], 128, 2),
            (5, [512, 512], 256, 2),
        ]
        for stage, filters, in_c, stride in specs:
            lr = lr_mult_list[stage - 2]
            # DCNv2 per stage (framework capability superset: the reference
            # r18 config never enables it, but the block supports it — used
            # by the mini-2x flagship-feature tests)
            use_dcn = stage in dcn_v2_stages
            for b in range(2):
                pn = f"res{stage}{_STAGE_LETTERS[b]}"
                name = f"stage{stage}_{b}"
                ch[name] = BasicBlock(
                    f"{prefix}.{name}", in_c if b == 0 else filters[1], filters,
                    norm, lr, stride=stride if b == 0 else 1,
                    is_first=(stage == 2 and b == 0), use_dcn=use_dcn,
                    paddle_name=pn, freeze_norm=freeze_norm)
        self.children_ = ch
        self._stage_blocks = {s: [f"stage{s}_0", f"stage{s}_1"] for s, _, _, _ in specs}
        if freeze_at:
            self.freeze()

    def freeze(self):
        if self.freeze_at >= 1:
            for i in (1, 2, 3):
                self.children_[f"stage1_conv1_{i}"].frozen = True
        for s in (2, 3, 4, 5):
            if self.freeze_at >= s:
                for name in self._stage_blocks[s]:
                    self.children_[name].set_frozen(True)

    def apply(self, params, x, ctx: Ctx) -> List[jax.Array]:
        x = _apply_stem(self.children_, params, x, ctx)
        feats = {}
        for s in (2, 3, 4, 5):
            for name in self._stage_blocks[s]:
                x = self.children_[name].apply(params[name], x, ctx)
            feats[s] = x
        return [feats[s] for s in self.feature_maps]
