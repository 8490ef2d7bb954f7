"""Blender-side render script (runs INSIDE ``blender --background --python``).

Rebuild of reference src/data/rendering/blender_script.py:1-1380, producing
the same on-disk contract the runtime dataset reads
(mvd_tpu/data/objaverse.py): per object, ``NNN.png`` renders + ``NNN.npy``
4x4 camera-to-world matrices + ``num_renders.txt`` + ``metadata.json`` +
``render_complete.txt`` marker + ``blender_debug.log``.

Behavior kept:
  * multi-format mesh import (reference :16-28) + the ``.blend`` special
    case (open + reset cameras instead of a fresh scene, :968-973)
  * GSO -90° X fix-up (:351-388)
  * invisible-object cleanup (:491-509)
  * missing-texture repair: drop dangling TEX_IMAGE nodes, substitute a
    random base color per missing file, skipped for ``.usdz`` whose
    textures are embedded (:617-664, 999-1004)
  * texture-visibility enforcement: link TEX_IMAGE -> Principled base
    color when unconnected (:846-903, 1007-1008)
  * single random color for ``.stl``/``.ply``/texture-less objects
    (:700-712, 1011-1018), recorded in metadata
  * metadata extracted BEFORE normalization (:992-996), with
    missing_textures / has_visible_textures / random_color fields
  * scene normalization to the unit cube (:512-614)
  * 4-sun light rig (:213-290), transparent background (:1078-1094),
    EEVEE/CYCLES settings (:1097-1127)
  * FIXED per-count camera rings: alternating +20°/-10° elevations on
    evenly spaced azimuths (negated = counter-clockwise), radius 1.8,
    35 mm lens — the reference's actual path for 6/8/12 views
    (:1041-1058, 906-941); random spherical fallback for other counts
    (:942-949) honoring ``--only-northern-hemisphere``
  * ``scene.blend`` debug save (:1035)

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
    ".blend": None,  # opened, not imported (render_object)
}

VIEW_COUNT_CHOICES = (6, 8, 12)
CAMERA_RADIUS = 1.8
LENS_MM = 35.0

# Reference blender_script.py:1041-1051 — fixed per-count rings with
# alternating high/low elevations.
CAMERA_ANGLE_TABLES = {
    12: ([0, 30, 60, 90, 120, 150, 180, 210, 240, 270, 300, 330],
         [20, -10] * 6),
    8: ([0, 45, 90, 135, 180, 225, 270, 315], [20, -10] * 4),
    6: ([30, 90, 150, 210, 270, 330], [20, -10] * 3),
}


def camera_positions_for(
    num_renders: int,
    radius: float = CAMERA_RADIUS,
    rng: "random.Random | None" = None,
    only_northern_hemisphere: bool = False,
):
    """Camera positions for ``num_renders`` views (pure, bpy-free).

    For 6/8/12 views: the reference's fixed tables — azimuth NEGATED
    (counter-clockwise sweep, reference :928) at alternating +20°/-10°
    elevation, radius 1.8.  Other counts fall back to uniform random
    directions on the sphere (northern hemisphere only when asked),
    scaled to the same radius (reference :942-949)."""
    table = CAMERA_ANGLE_TABLES.get(num_renders)
    positions = []
    if table is not None:
        azimuths, elevations = table
        for az_deg, el_deg in zip(azimuths, elevations):
            az = -math.radians(az_deg)
            el = math.radians(el_deg)
            positions.append((
                radius * math.cos(el) * math.cos(az),
                radius * math.cos(el) * math.sin(az),
                radius * math.sin(el),
            ))
        return positions
    rng = rng or random.Random()
    while len(positions) < num_renders:
        v = np.array([rng.gauss(0, 1) for _ in range(3)])
        n = float(np.linalg.norm(v))
        if n < 1e-8:
            continue
        v = v / n
        if only_northern_hemisphere:
            v[2] = abs(v[2])
        positions.append(tuple(float(x) * radius for x in v))
    return positions


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


def reset_cameras():
    """Delete every camera and add one fresh (reference :46-60) — used for
    ``.blend`` scenes that are opened rather than imported."""
    for obj in list(bpy.context.scene.objects):
        if obj.type == "CAMERA":
            bpy.data.objects.remove(obj, do_unlink=True)


def import_object(path: str, is_gso: bool = False):
    ext = os.path.splitext(path)[1].lower()
    if ext not in IMPORT_FUNCTIONS or IMPORT_FUNCTIONS[ext] is None:
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
    # invisible collections too (reference :506-509)
    for col in [c for c in bpy.data.collections if c.hide_viewport]:
        bpy.data.collections.remove(col)
    return removed


def delete_missing_textures(rng=None):
    """Drop TEX_IMAGE nodes whose file is missing, substituting one random
    base color per missing file path on the connected Principled BSDF
    (reference :617-664).  Embedded images (empty filepath) are kept."""
    rng = rng or random
    count = 0
    files = []
    file_path_to_color = {}
    for material in bpy.data.materials:
        if not material.use_nodes:
            continue
        for node in list(material.node_tree.nodes):
            if node.type != "TEX_IMAGE" or node.image is None:
                continue
            file_path = bpy.path.abspath(node.image.filepath)
            if file_path == "" or os.path.exists(file_path):
                continue
            links = node.outputs[0].links
            if links:
                connected = links[0].to_node
                if connected.type == "BSDF_PRINCIPLED":
                    if file_path not in file_path_to_color:
                        file_path_to_color[file_path] = [
                            rng.random() for _ in range(3)
                        ] + [1.0]
                    connected.inputs["Base Color"].default_value = (
                        file_path_to_color[file_path]
                    )
            material.node_tree.nodes.remove(node)
            count += 1
            files.append(file_path)
    return {"count": count, "files": files, "file_path_to_color": file_path_to_color}


def ensure_texture_visibility():
    """Link each material's TEX_IMAGE to the Principled base color when
    unconnected; True iff any texture exists (reference :846-903)."""
    texture_count = 0
    for material in bpy.data.materials:
        if not material.use_nodes:
            continue
        principled = next(
            (n for n in material.node_tree.nodes if n.type == "BSDF_PRINCIPLED"), None
        )
        for node in material.node_tree.nodes:
            if node.type == "TEX_IMAGE" and node.image:
                texture_count += 1
                if principled is not None and not any(
                    link.to_socket == principled.inputs["Base Color"]
                    for link in material.node_tree.links
                ):
                    material.node_tree.links.new(
                        node.outputs["Color"], principled.inputs["Base Color"]
                    )
    return texture_count > 0


def apply_single_random_color_to_all_objects(rng=None):
    """One random RGB(A=1) color on every mesh via a fresh Principled
    material (reference :667-712)."""
    rng = rng or random
    color = (rng.random(), rng.random(), rng.random(), 1.0)
    for obj in scene_mesh_objects():
        mat = bpy.data.materials.new(name=f"RandomMaterial_{obj.name}")
        mat.use_nodes = True
        principled = mat.node_tree.nodes.get("Principled BSDF")
        if principled:
            principled.inputs["Base Color"].default_value = color
        obj.data.materials.append(mat)
    return color


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
    # cameras must not inherit object transforms (reference :611-614)
    for obj in bpy.context.scene.objects:
        if obj.type == "CAMERA" and obj.parent is not None:
            obj.parent = None


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
    cam_data.sensor_width = 32.0  # reference :979
    cam = bpy.data.objects.new("cam", cam_data)
    bpy.context.collection.objects.link(cam)
    bpy.context.scene.camera = cam
    return cam


def place_camera(cam, position):
    """Set position and aim at the origin (the explicit look-at equivalent
    of the reference's TRACK_TO-an-origin-empty constraint, :981-987)."""
    cam.location = position
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


def render_object(
    object_path,
    output_dir,
    engine,
    resolution,
    seed,
    is_gso=False,
    only_northern_hemisphere=False,
    save_blend=True,
):
    os.makedirs(output_dir, exist_ok=True)
    log(output_dir, f"rendering {object_path}")
    rng = random.Random(seed)
    ext = os.path.splitext(object_path)[1].lower()

    if ext == ".blend":
        # open the scene in place: keep its objects, drop its cameras and
        # anything invisible (reference :968-973)
        bpy.ops.wm.open_mainfile(filepath=object_path)
        reset_cameras()
        n_removed = delete_invisible_objects()
    else:
        reset_scene()
        import_object(object_path, is_gso=is_gso)
        n_removed = delete_invisible_objects()
    log(output_dir, f"removed {n_removed} invisible objects")

    # metadata BEFORE normalization, as the reference orders it (:992-996)
    metadata = extract_metadata(object_path)

    # texture repair (reference :999-1018): usdz textures are embedded —
    # don't treat them as missing
    if ext == ".usdz":
        metadata["missing_textures"] = None
    else:
        missing = delete_missing_textures(rng)
        metadata["missing_textures"] = missing
        log(output_dir, f"repaired {missing['count']} missing textures")
    has_visible_textures = ensure_texture_visibility()
    metadata["has_visible_textures"] = has_visible_textures
    if ext in (".stl", ".ply") or not has_visible_textures:
        metadata["random_color"] = list(apply_single_random_color_to_all_objects(rng))
        log(output_dir, f"applied random color {metadata['random_color']}")
    else:
        metadata["random_color"] = None

    with open(os.path.join(output_dir, "metadata.json"), "w", encoding="utf-8") as f:
        json.dump(metadata, f, indent=2)

    normalize_scene()
    setup_lights()
    setup_render(engine, resolution)
    cam = make_camera()
    if save_blend:  # debugging artifact (reference :1035)
        bpy.ops.wm.save_as_mainfile(filepath=os.path.join(output_dir, "scene.blend"))

    num_views = rng.choice(VIEW_COUNT_CHOICES)
    positions = camera_positions_for(
        num_views, rng=rng, only_northern_hemisphere=only_northern_hemisphere
    )
    for i, pos in enumerate(positions):
        place_camera(cam, pos)
        bpy.context.scene.render.filepath = os.path.join(output_dir, f"{i:03d}.png")
        bpy.ops.render.render(write_still=True)
        cam_matrix = np.array(cam.matrix_world, dtype=np.float32)  # 4x4 c2w
        np.save(os.path.join(output_dir, f"{i:03d}.npy"), cam_matrix)
        log(output_dir, f"view {i}: pos={tuple(round(p, 3) for p in pos)}")

    with open(os.path.join(output_dir, "num_renders.txt"), "w") as f:
        f.write(str(num_views))
    with open(os.path.join(output_dir, "render_complete.txt"), "w") as f:
        f.write(
            json.dumps(
                {
                    "num_views": num_views,
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
    p.add_argument("--only-northern-hemisphere", action="store_true")
    p.add_argument("--no-save-blend", action="store_true")
    args = p.parse_args(argv)
    if bpy is None:
        raise RuntimeError("must run inside Blender: blender --background --python ...")
    render_object(
        args.object_path, args.output_dir, args.engine, args.resolution, args.seed,
        is_gso=args.gso,
        only_northern_hemisphere=args.only_northern_hemisphere,
        save_blend=not args.no_save_blend,
    )


if __name__ == "__main__":
    main()
