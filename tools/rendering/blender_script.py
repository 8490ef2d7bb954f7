"""Blender-side render script (runs INSIDE ``blender --background --python``).

Rebuild of reference src/data/rendering/blender_script.py:1-1380, producing
the same on-disk contract the runtime dataset reads
(mvd_tpu/data/objaverse.py): per object, ``NNN.png`` renders + ``NNN.npy``
4x4 camera-to-world matrices + ``num_renders.txt`` + ``metadata.json`` +
``render_complete.txt`` marker + ``blender_debug.log``.

Behavior kept: multi-format mesh import (reference :16-28), GSO -90° X
fix-up (:351-388), invisible-object cleanup (:491-509), scene normalization
to the unit cube (:512-614), 4-sun light rig (:213-290), transparent
background (:1078-1094), EEVEE/CYCLES settings (:1097-1127), randomly 6/8/12
views on fixed-elevation azimuth rings at radius 1.8 with a 35mm lens
(:906-949, 1041-1058, 1206-1212).

Out of scope for the TPU build (stays a CPU/GPU offline tool) — this script
never touches JAX.
"""

import argparse
import json
import math
import os
import random
import sys
import time

try:
    import bpy
    from mathutils import Vector
except ImportError:  # allows import for docs/tests outside Blender
    bpy = None
    Vector = None

import numpy as np

IMPORT_FUNCTIONS = {
    ".obj": lambda p: bpy.ops.wm.obj_import(filepath=p),
    ".glb": lambda p: bpy.ops.import_scene.gltf(filepath=p, merge_vertices=True),
    ".gltf": lambda p: bpy.ops.import_scene.gltf(filepath=p, merge_vertices=True),
    ".fbx": lambda p: bpy.ops.import_scene.fbx(filepath=p),
    ".stl": lambda p: bpy.ops.wm.stl_import(filepath=p),
    ".ply": lambda p: bpy.ops.wm.ply_import(filepath=p),
    ".dae": lambda p: bpy.ops.wm.collada_import(filepath=p),
    ".abc": lambda p: bpy.ops.wm.alembic_import(filepath=p),
    ".usd": lambda p: bpy.ops.wm.usd_import(filepath=p),
    ".usdz": lambda p: bpy.ops.wm.usd_import(filepath=p),
    ".x3d": lambda p: bpy.ops.import_scene.x3d(filepath=p),
}

VIEW_COUNT_CHOICES = (6, 8, 12)
CAMERA_RADIUS = 1.8
LENS_MM = 35.0


def log(output_dir, msg):
    with open(os.path.join(output_dir, "blender_debug.log"), "a") as f:
        f.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")


def reset_scene():
    bpy.ops.object.select_all(action="SELECT")
    bpy.ops.object.delete()
    for block in (bpy.data.meshes, bpy.data.materials, bpy.data.images, bpy.data.lights):
        for item in list(block):
            if item.users == 0:
                block.remove(item)


def import_object(path: str, is_gso: bool = False):
    ext = os.path.splitext(path)[1].lower()
    if ext not in IMPORT_FUNCTIONS:
        raise ValueError(f"unsupported format: {ext}")
    IMPORT_FUNCTIONS[ext](path)
    if is_gso:
        # GSO assets are Z-up rotated; -90° about X fixes orientation
        for obj in scene_mesh_objects():
            obj.rotation_euler[0] -= math.pi / 2


def scene_mesh_objects():
    return [o for o in bpy.context.scene.objects if o.type == "MESH"]


def delete_invisible_objects():
    removed = 0
    for obj in list(bpy.context.scene.objects):
        if obj.hide_render or obj.hide_viewport:
            bpy.data.objects.remove(obj, do_unlink=True)
            removed += 1
    return removed


def scene_bbox():
    mins = Vector((1e9, 1e9, 1e9))
    maxs = Vector((-1e9, -1e9, -1e9))
    for obj in scene_mesh_objects():
        for corner in obj.bound_box:
            world = obj.matrix_world @ Vector(corner)
            mins = Vector(map(min, mins, world))
            maxs = Vector(map(max, maxs, world))
    return mins, maxs


def normalize_scene():
    """Scale + recenter so the scene fits the unit cube at the origin."""
    mins, maxs = scene_bbox()
    scale = 1.0 / max(max(maxs - mins), 1e-6)
    for obj in scene_mesh_objects():
        if obj.parent is None:
            obj.scale = obj.scale * scale
    bpy.context.view_layer.update()
    mins, maxs = scene_bbox()
    offset = -(mins + maxs) / 2
    for obj in scene_mesh_objects():
        if obj.parent is None:
            obj.matrix_world.translation += offset
    bpy.context.view_layer.update()


def setup_lights():
    """4-sun rig (reference :213-290): key/fill/rim/bottom."""
    specs = [
        ("key", (0.785, 0.0, -0.785), 3.0),
        ("fill", (0.785, 0.0, 2.356), 1.5),
        ("rim", (-0.785, 0.0, 3.927), 2.0),
        ("bottom", (3.14, 0.0, 0.0), 1.0),
    ]
    for name, rot, energy in specs:
        light_data = bpy.data.lights.new(name=f"sun_{name}", type="SUN")
        light_data.energy = energy
        light = bpy.data.objects.new(name=f"sun_{name}", object_data=light_data)
        bpy.context.collection.objects.link(light)
        light.rotation_euler = rot


def setup_render(engine: str, resolution: int):
    scene = bpy.context.scene
    scene.render.engine = "CYCLES" if engine.upper() == "CYCLES" else "BLENDER_EEVEE_NEXT"
    scene.render.image_settings.file_format = "PNG"
    scene.render.image_settings.color_mode = "RGBA"
    scene.render.resolution_x = resolution
    scene.render.resolution_y = resolution
    scene.render.film_transparent = True  # transparent background (:1078-1094)
    if scene.render.engine == "CYCLES":
        scene.cycles.samples = 64
        scene.cycles.use_denoising = True


def make_camera():
    cam_data = bpy.data.cameras.new("cam")
    cam_data.lens = LENS_MM
    cam = bpy.data.objects.new("cam", cam_data)
    bpy.context.collection.objects.link(cam)
    bpy.context.scene.camera = cam
    return cam


def place_camera(cam, azimuth_deg: float, elevation_deg: float, radius: float):
    az = math.radians(azimuth_deg)
    el = math.radians(elevation_deg)
    cam.location = (
        radius * math.cos(el) * math.cos(az),
        radius * math.cos(el) * math.sin(az),
        radius * math.sin(el),
    )
    direction = -Vector(cam.location)
    cam.rotation_euler = direction.to_track_quat("-Z", "Y").to_euler()
    bpy.context.view_layer.update()


def _linked_files():
    """Filepaths of all linked assets: FILE-source images, material texture
    nodes, linked libraries (reference MetadataExtractor.get_linked_files,
    blender_script.py:779-816)."""
    paths = set()
    for image in bpy.data.images:
        if image.source == "FILE":
            paths.add(bpy.path.abspath(image.filepath))
    for material in bpy.data.materials:
        if material.use_nodes:
            for node in material.node_tree.nodes:
                if node.type == "TEX_IMAGE" and node.image is not None:
                    paths.add(bpy.path.abspath(node.image.filepath))
    for library in bpy.data.libraries:
        paths.add(bpy.path.abspath(library.filepath))
    paths.discard("")
    return sorted(paths)


def extract_metadata(object_path):
    """Full scene metadata (reference MetadataExtractor.get_metadata,
    blender_script.py:714-870: file size, poly/vert/edge counts, material/
    object/lamp/mesh/animation counts, linked files, scene bbox, shape keys,
    armatures)."""
    meshes = scene_mesh_objects()
    scene = bpy.context.scene
    shape_keys = 0
    for o in meshes:
        if o.data.shape_keys is not None:
            shape_keys += len(o.data.shape_keys.key_blocks) - 1  # minus Basis
    bbox_min, bbox_max = scene_bbox()
    return {
        "object_path": object_path,
        "file_size": os.path.getsize(object_path) if os.path.exists(object_path) else 0,
        "poly_count": sum(len(o.data.polygons) for o in meshes),
        "vert_count": sum(len(o.data.vertices) for o in meshes),
        "edge_count": sum(len(o.data.edges) for o in meshes),
        "material_count": len(bpy.data.materials),
        "object_count": len(bpy.data.objects),
        "lamp_count": sum(1 for o in scene.objects if o.type == "LIGHT"),
        "mesh_count": len(meshes),
        "animation_count": len(bpy.data.actions),
        "linked_files": _linked_files(),
        "scene_size": {"bbox_min": list(bbox_min), "bbox_max": list(bbox_max)},
        "shape_key_count": shape_keys,
        "armature_count": sum(1 for o in scene.objects if o.type == "ARMATURE"),
    }


def render_object(object_path, output_dir, engine, resolution, seed, is_gso=False):
    os.makedirs(output_dir, exist_ok=True)
    log(output_dir, f"rendering {object_path}")
    rng = random.Random(seed)

    reset_scene()
    import_object(object_path, is_gso=is_gso)
    n_removed = delete_invisible_objects()
    log(output_dir, f"removed {n_removed} invisible objects")
    normalize_scene()
    setup_lights()
    setup_render(engine, resolution)
    cam = make_camera()

    num_views = rng.choice(VIEW_COUNT_CHOICES)
    elevation = rng.uniform(15.0, 35.0)
    start_az = rng.uniform(0.0, 360.0)

    for i in range(num_views):
        az = start_az + 360.0 * i / num_views
        place_camera(cam, az, elevation, CAMERA_RADIUS)
        bpy.context.scene.render.filepath = os.path.join(output_dir, f"{i:03d}.png")
        bpy.ops.render.render(write_still=True)
        cam_matrix = np.array(cam.matrix_world, dtype=np.float32)  # 4x4 c2w
        np.save(os.path.join(output_dir, f"{i:03d}.npy"), cam_matrix)
        log(output_dir, f"view {i}: az={az:.1f} el={elevation:.1f}")

    with open(os.path.join(output_dir, "num_renders.txt"), "w") as f:
        f.write(str(num_views))
    with open(os.path.join(output_dir, "metadata.json"), "w") as f:
        json.dump(extract_metadata(object_path), f, indent=2)
    with open(os.path.join(output_dir, "render_complete.txt"), "w") as f:
        f.write(
            json.dumps(
                {
                    "num_views": num_views,
                    "elevation": elevation,
                    "radius": CAMERA_RADIUS,
                    "engine": bpy.context.scene.render.engine,
                    "resolution": resolution,
                }
            )
        )
    log(output_dir, "done")
    return num_views


def main():
    argv = sys.argv[sys.argv.index("--") + 1 :] if "--" in sys.argv else []
    p = argparse.ArgumentParser()
    p.add_argument("--object-path", required=True)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--engine", default="EEVEE")
    p.add_argument("--resolution", type=int, default=1024)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--gso", action="store_true")
    args = p.parse_args(argv)
    if bpy is None:
        raise RuntimeError("must run inside Blender: blender --background --python ...")
    render_object(
        args.object_path, args.output_dir, args.engine, args.resolution, args.seed,
        is_gso=args.gso,
    )


if __name__ == "__main__":
    main()
