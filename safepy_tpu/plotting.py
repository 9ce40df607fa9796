"""Visualization: base network plots, composite domain landscapes, attribute maps.

Host-side matplotlib over fetched arrays; behavioral spec is the reference L4 layer
(safepy/safe.py:747-1265 and safepy/safe_io.py:433-690). Differences from the
reference are deliberate and noted inline:

  * the random edge sampling for huge networks and the domain color shuffle are
    seedable (the reference uses global RNG state — nondeterministic plots);
  * the per-domain contour plot indexes its axes correctly (the reference has a
    latent ``ax[1].contour`` on a non-subscriptable Axes, safe.py:837).
"""

from __future__ import annotations

import logging
import os
import random
import re
import textwrap

import matplotlib.pyplot as plt
import networkx as nx
import numpy as np
import pandas as pd
from matplotlib.colors import LinearSegmentedColormap
from scipy.optimize import fmin
from scipy.spatial import ConvexHull
from scipy.stats import gaussian_kde

from safepy_tpu.colormaps import MidpointRangeNormalize, get_colors
from safepy_tpu.io.graph_arrays import get_node_coordinates


def plot_network(G, ax=None, foreground_color="#ffffff", background_color="#000000",
                 random_sampling_edges_min=30000, title="Network", node_size=10,
                 alpha=0.2, seed=None):
    """Base scatter+edge rendering of the network (safe_io.py:433-486)."""
    if background_color == "#ffffff":
        foreground_color = "#000000"

    node_xy = get_node_coordinates(G)

    if ax is None:
        fig, ax = plt.subplots(figsize=(20, 10), facecolor=background_color,
                               edgecolor=foreground_color)
        fig.set_facecolor(background_color)

    edges = tuple(G.edges())
    if len(edges) >= random_sampling_edges_min:
        logging.warning(
            "Edges are randomly sampled because the network (edges=%d) is too big "
            "(random_sampling_edges_min=%d)." % (len(edges), random_sampling_edges_min))
        edges = random.Random(seed).sample(edges, int(len(edges) * 0.1))

    pos = {n: node_xy[i] for i, n in enumerate(G)}
    nx.draw(G, ax=ax, pos=pos, edgelist=edges, node_color=foreground_color,
            edge_color=foreground_color, node_size=node_size, width=1, alpha=alpha)

    ax.set_aspect("equal")
    ax.set_facecolor(background_color)
    ax.grid(False)
    ax.invert_yaxis()
    ax.margins(0.1, 0.1)
    ax.set_title(title, color=foreground_color)
    plt.axis("off")
    return ax


def plot_network_contour(graph, ax, background_color="#000000"):
    """Least-squares circle through the layout's convex hull (safe_io.py:489-529)."""
    foreground_color = "#ffffff" if background_color != "#ffffff" else "#000000"

    node_xy = get_node_coordinates(graph)
    hull = ConvexHull(node_xy)
    vx = node_xy[hull.vertices, 0]
    vy = node_xy[hull.vertices, 1]

    xm, ym = np.nanmean(vx), np.nanmean(vy)
    rm = np.nanmean(np.sqrt((vx - xm) ** 2 + (vy - ym) ** 2))

    def err(x0):
        w, v, r = x0
        pts = np.sqrt((vx - w) ** 2 + (vy - v) ** 2) - r
        return (pts ** 2).sum()

    xf, yf, rf = fmin(err, [xm, ym, rm], disp=False)

    circ = plt.Circle((xf, yf), radius=rf * 1.01, color=foreground_color,
                      linewidth=1, fill=False)
    ax.add_patch(circ)
    return xf, yf, rf


def plot_costanzo2016_network_annotations(graph, ax, path_to_data, colors=True,
                                          clabels=False,
                                          foreground_color="#ffffff",
                                          background_color="#000000"):
    """Published process-region KDE contours from the safe-data bundle
    (safe_io.py:532-586)."""
    if background_color == "#ffffff":
        foreground_color = "#000000"

    annot = ("other/Data File S5_SAFE analysis_Gene cluster identity and "
             "functional enrichments.xlsx")
    costanzo2016 = pd.read_excel(os.path.join(path_to_data, annot),
                                 sheet_name="Global net. cluster gene list")
    processes = costanzo2016["Global Similarity Network Region name"].unique()
    processes = processes[pd.notnull(processes)]

    process_colors = pd.read_csv(
        os.path.join(path_to_data, "other/costanzo_2016_colors.txt"), sep="\t")
    if colors:
        process_colors = process_colors[["R", "G", "B"]].values / 256
    elif foreground_color == "#ffffff":
        process_colors = np.ones((process_colors.shape[0], 3))
    else:
        process_colors = np.zeros((process_colors.shape[0], 3))

    labels = nx.get_node_attributes(graph, "label")
    label2node = {v: k for k, v in labels.items()}
    node_xy = get_node_coordinates(graph)
    x, y = node_xy[:, 0], node_xy[:, 1]

    for n_process, process in enumerate(processes):
        genes = costanzo2016.loc[
            costanzo2016["Global Similarity Network Region name"] == process,
            "Gene/Allele"]
        idx = [label2node[g] for g in genes if g in label2node]
        pos3 = node_xy[idx, :]

        kernel = gaussian_kde(pos3.T)
        X, Y = np.mgrid[np.min(x):np.max(x):100j, np.min(y):np.max(y):100j]
        Z = np.reshape(kernel(np.vstack([X.ravel(), Y.ravel()])).T, X.shape)

        C = ax.contour(X, Y, Z, [1e-6],
                       colors=[tuple(process_colors[n_process, :])], alpha=1)
        if clabels:
            C.levels = [n_process + 1]
            plt.clabel(C, C.levels, inline=True, fmt="%d", fontsize=16)
            logging.info("%d -- %s" % (n_process + 1, process))


def mark_nodes(x, y, kind, ax=None, foreground_color="#ffffff",
               background_color="#000000", labels=None, label_va="center",
               legend_label=None, **kws):
    """Mark and/or text-label selected nodes (safe_io.py:589-646)."""
    if ax is None:
        ax = plt.gca()
    if isinstance(kind, str):
        kind = [kind]

    sn1 = None
    if "mark" in kind:
        sn1 = ax.scatter(x, y, **kws)

    if "label" in kind:
        assert len(x) == len(labels), f"len(x)!=len(labels): {len(x)}!={len(labels)}"
        for i, label in enumerate(labels):
            ax.text(x[i], y[i], label,
                    fontdict={"color": "white" if background_color == "#000000" else "k",
                              "size": 14, "weight": "bold"},
                    ha="center", va=label_va)

    if legend_label is not None and sn1 is not None:
        leg = ax.legend([sn1], [legend_label], loc="upper left",
                        bbox_to_anchor=(0, 1), title="Significance",
                        scatterpoints=1, fancybox=False,
                        facecolor=background_color, edgecolor=background_color)
        for leg_txt in leg.get_texts():
            leg_txt.set_color(foreground_color)
        leg.get_title().set_color(foreground_color)
    return ax


def plot_safe_network(sf, foreground_color="#ffffff", background_color="#000000",
                      labels=(), node_size=10, alpha=0.2, **kwargs_mark_nodes):
    """SAFE.plot_network: base plot plus optional labeled nodes (safe.py:747-784)."""
    ax = plot_network(sf.graph, background_color=background_color,
                      node_size=node_size, alpha=alpha)
    if len(labels) > 0:
        node_xy_labels, labels_found = get_node_coordinates(sf.graph, labels=labels)
        ax = mark_nodes(node_xy_labels[:, 0], node_xy_labels[:, 1], kind=["label"],
                        labels=labels_found, ax=ax,
                        foreground_color=foreground_color,
                        background_color=background_color, **kwargs_mark_nodes)
    return ax


def _domain_colors(sf, seed=None):
    domains = np.sort(sf.attributes["domain"].unique())
    domain2rgb = get_colors("hsv", len(domains), seed=seed)
    sf.domains["rgba"] = domain2rgb[:len(sf.domains)].tolist()
    return domains, domain2rgb


def plot_composite_network(sf, show_each_domain=False, show_domain_ids=True,
                           show_network_contour=True, save_fig=None, labels=(),
                           foreground_color="#ffffff", background_color="#000000",
                           color_seed=None):
    """All nodes colored by their domain mixtures (safe.py:851-1003)."""
    if background_color == "#ffffff":
        foreground_color = "#000000"

    domains, domain2rgb = _domain_colors(sf, seed=color_seed)

    domain_of_attr = sf.attributes["domain"].values
    unique_domains = np.sort(np.unique(domain_of_attr))
    counts = np.stack([sf.nes_binary[:, domain_of_attr == d].sum(axis=1)
                       for d in unique_domains], axis=1)
    total = counts.sum(axis=1, keepdims=True)

    with np.errstate(divide="ignore", invalid="ignore"):
        c = (counts @ domain2rgb[:counts.shape[1]]) / total

    t = np.sum(c, axis=1)
    c[np.isnan(t) | np.isinf(t), :] = [0, 0, 0, 0]

    coeff = 0.1 / np.nanmean(np.ravel(c[:, :-1])) if np.nanmean(np.ravel(c[:, :-1])) else 1.0
    if coeff > 1:
        c = c * coeff
    c = np.clip(c, None, 1)

    ix = np.argsort(np.sum(c, axis=1))  # dimmest first
    node_xy = get_node_coordinates(sf.graph)

    num_plots = 2 + (len(domains) - 1 if show_each_domain else 0)
    nrows = int(np.ceil(num_plots / 2))
    ncols = min(num_plots, 2)
    fig, axes = plt.subplots(nrows=nrows, ncols=ncols,
                             figsize=(10 * ncols, 10 * nrows), sharex=True,
                             sharey=True, facecolor=background_color)
    axes = np.atleast_1d(axes).ravel()

    plot_network(sf.graph, ax=axes[0], background_color=background_color)

    axes[1].scatter(node_xy[ix, 0], node_xy[ix, 1], c=c[ix], s=60, edgecolor=None)
    axes[1].set_aspect("equal")
    axes[1].set_facecolor(background_color)

    if show_network_contour:
        plot_network_contour(sf.graph, axes[1], background_color=background_color)

    if len(labels) != 0:
        node_xy_labels, labels_found = get_node_coordinates(sf.graph, labels=labels)
        mark_nodes(node_xy_labels[:, 0], node_xy_labels[:, 1], kind=["label"],
                   labels=labels_found, ax=axes[1],
                   foreground_color=foreground_color,
                   background_color=background_color)

    if show_domain_ids:
        for domain in domains[domains > 0]:
            idx = sf.node2domain["primary_domain"] == domain
            axes[1].text(np.nanmean(node_xy[idx, 0]), np.nanmean(node_xy[idx, 1]),
                         str(domain),
                         fontdict={"size": 16, "color": foreground_color,
                                   "weight": "bold"})

    if show_each_domain:
        node2nes = pd.DataFrame(sf.nes)
        for domain in domains[domains > 0]:
            ax = axes[1 + domain]
            domain_color = np.reshape(domain2rgb[domain, :], (1, 4))
            idx = (sf.node2domain["primary_domain"] == domain).values
            cc = np.repeat(domain_color, len(node_xy), axis=0)
            ax.scatter(node_xy[idx, 0], node_xy[idx, 1], c=cc[idx], s=60,
                       edgecolor=None)
            ax.set_aspect("equal")
            ax.set_facecolor(background_color)
            ax.set_title("Domain %d\n%s"
                         % (domain, sf.domains.loc[domain, "label"]),
                         color=foreground_color)
            if show_network_contour:
                plot_network_contour(sf.graph, ax, background_color=background_color)

    fig.set_facecolor(background_color)
    if save_fig:
        logging.info("Output path: %s" % save_fig)
        plt.savefig(save_fig, facecolor=background_color)
    return fig, axes


def plot_composite_network_contours(sf, save_fig=None, clabels=False,
                                    background_color="#000000", color_seed=None):
    """KDE contour per domain over the base network (safe.py:786-849)."""
    domains, domain2rgb = _domain_colors(sf, seed=color_seed)
    node_xy = get_node_coordinates(sf.graph)

    fig, axes = plt.subplots(nrows=1, ncols=2, figsize=(20, 10), sharex=True,
                             sharey=True, facecolor=background_color)
    axes = axes.ravel()

    plot_network(sf.graph, ax=axes[0], background_color=background_color)
    axes[1].set_aspect("equal")
    axes[1].set_facecolor(background_color)

    for n_domain, domain_label in enumerate(sf.domains["label"].values):
        if n_domain not in sf.node2domain.columns:
            continue
        nodes_indices = sf.node2domain.loc[
            sf.node2domain.loc[:, n_domain] > 0].index.values
        if len(nodes_indices) < 3:
            continue
        pos3 = node_xy[nodes_indices, :]
        kernel = gaussian_kde(pos3.T)
        X, Y = np.mgrid[np.min(pos3[:, 0]):np.max(pos3[:, 0]):100j,
                        np.min(pos3[:, 1]):np.max(pos3[:, 1]):100j]
        Z = np.reshape(kernel(np.vstack([X.ravel(), Y.ravel()])).T, X.shape)

        C = axes[1].contour(X, Y, Z, [1e-6],
                            colors=[tuple(sf.domains.loc[n_domain, "rgba"])]
                            if "rgba" in sf.domains else None, alpha=1)
        if clabels:
            C.levels = [n_domain + 1]
            plt.clabel(C, C.levels, inline=True, fmt="%d", fontsize=16)
            logging.info("%d -- %s" % (n_domain + 1, domain_label))

    fig.set_facecolor(background_color)
    if save_fig:
        logging.info("Output path: %s" % save_fig)
        plt.savefig(save_fig, facecolor=background_color)
    return fig, axes


def plot_sample_attributes(sf, attributes=1, top_attributes_only=False,
                           show_network=True, show_network_contour=True,
                           show_costanzo2016=False, show_costanzo2016_colors=True,
                           show_costanzo2016_clabels=False, show_nes=True,
                           show_raw_data=False, show_significant_nodes=False,
                           show_colorbar=True, colors=("82add6", "facb66"),
                           foreground_color="#ffffff", background_color="#000000",
                           labels=(), save_fig=None, seed=None, **kwargs):
    """Per-attribute enrichment landscapes (safe.py:1005-1265)."""
    if background_color == "#ffffff":
        foreground_color = "#000000"

    all_attributes = sf.attributes.index.values
    if top_attributes_only:
        all_attributes = all_attributes[sf.attributes["top"]]

    if isinstance(attributes, int):
        if attributes < len(all_attributes):
            attributes = np.random.default_rng(seed).choice(
                all_attributes, attributes, replace=False)
        else:
            attributes = np.arange(len(all_attributes))
    elif isinstance(attributes, str):
        attributes = [list(sf.attributes["name"].values).index(attributes)]
    elif isinstance(attributes, list):
        attributes = [list(sf.attributes["name"].values).index(a) for a in attributes]

    node_xy = get_node_coordinates(sf.graph)

    nax = 1 if show_network else 0
    nrows = int(np.ceil((len(attributes) + nax) / 2))
    ncols = min(len(attributes) + nax, 2)
    fig, axes = plt.subplots(nrows=nrows, ncols=ncols,
                             figsize=(10 * ncols, 10 * nrows), sharex=True,
                             sharey=True, facecolor=background_color)
    axes = np.atleast_1d(np.asarray(axes)).ravel()

    if show_network:
        plot_network(sf.graph, ax=axes[0], background_color=background_color)

    score = sf.nes

    for idx_attribute, attribute in enumerate(attributes):
        ax = axes[idx_attribute + nax]
        sc = None
        vmin = vmax = None
        midrange = kwargs.get("midrange", [np.log10(0.05), 0, -np.log10(0.05)])

        if show_nes:
            vmin = kwargs.get("vmin", np.nanmin(
                [np.log10(1 / sf.num_permutations),
                 np.nanmin(-np.abs(score[:, attribute]))]))
            vmax = kwargs.get("vmax", np.nanmax(
                [-np.log10(1 / sf.num_permutations),
                 np.nanmax(np.abs(score[:, attribute]))]))

            order = np.argsort(np.abs(score[:, attribute]))

            colors_hex = [colors[0], background_color, background_color,
                          background_color, colors[1]]
            colors_hex = [re.sub(r"^#", "", c) for c in colors_hex]
            colors_rgb = [tuple(int(c[i:i + 2], 16) / 255 for i in (0, 2, 4))
                          for c in colors_hex]
            cmap = LinearSegmentedColormap.from_list("my_cmap", colors_rgb)

            sc = ax.scatter(node_xy[order, 0], node_xy[order, 1],
                            c=score[order, attribute], s=60, cmap=cmap,
                            norm=MidpointRangeNormalize(midrange=midrange,
                                                        vmin=vmin, vmax=vmax),
                            edgecolors=None)

        if show_colorbar and sc is not None:
            pos_ax = ax.get_position()
            w = pos_ax.width * 0.75
            x0 = pos_ax.x0 + (pos_ax.width - w) / 2
            cax = fig.add_axes([x0, pos_ax.y0, w, pos_ax.height * 0.05])
            cb = plt.colorbar(sc, cax=cax, orientation="horizontal",
                              ticks=[vmin, *midrange, vmax], drawedges=False)
            cb.set_label("Neighborhood enrichment p-value", color=foreground_color)
            cax.xaxis.set_tick_params(color=foreground_color)
            cb.outline.set_edgecolor(foreground_color)
            cb.outline.set_linewidth(1)
            plt.setp(plt.getp(cb.ax.axes, "xticklabels"), color=foreground_color)
            cb.ax.set_xticklabels(
                [r"$10^{%d}$" % vmin, r"$10^{%d}$" % midrange[0], r"$1$",
                 r"$10^{%d}$" % -midrange[2], r"$10^{-%d}$" % vmax])
            cax.text(cax.get_xlim()[0], 1, "Lower than random",
                     verticalalignment="bottom",
                     fontdict={"color": foreground_color})
            cax.text(cax.get_xlim()[1], 1, "Higher than random",
                     verticalalignment="bottom", horizontalalignment="right",
                     fontdict={"color": foreground_color})

        if show_raw_data:
            _plot_raw_data(sf, ax, attribute, node_xy, foreground_color,
                           background_color)

        if show_significant_nodes:
            with np.errstate(divide="ignore", invalid="ignore"):
                sig = np.abs(sf.nes_binary[:, attribute]) > 0
            mark_nodes(node_xy[sig, 0], node_xy[sig, 1], kind=["mark"], ax=ax,
                       legend_label="p < %.2e" % sf.enrichment_threshold,
                       foreground_color=foreground_color,
                       background_color=background_color, marker="+")

        if show_costanzo2016:
            plot_costanzo2016_network_annotations(
                sf.graph, ax, sf.path_to_safe_data,
                colors=show_costanzo2016_colors,
                clabels=show_costanzo2016_clabels,
                background_color=background_color)

        if show_network_contour:
            plot_network_contour(sf.graph, ax, background_color=background_color)

        if len(labels) != 0:
            node_xy_labels, labels_found = get_node_coordinates(sf.graph,
                                                                labels=labels)
            mark_nodes(node_xy_labels[:, 0], node_xy_labels[:, 1], kind=["label"],
                       labels=labels_found, ax=ax,
                       foreground_color=foreground_color,
                       background_color=background_color)

        ax.set_aspect("equal")
        ax.set_facecolor(background_color)
        ax.grid(False)
        ax.margins(0.1, 0.1)
        if idx_attribute + nax == 0:
            ax.invert_yaxis()
        title = "\n".join(textwrap.wrap(
            str(sf.attributes.loc[attribute, "name"]), width=30))
        ax.set_title(title, color=foreground_color)
        ax.set_frame_on(False)

    fig.set_facecolor(background_color)
    if save_fig:
        path_to_fig = save_fig
        if not os.path.isabs(path_to_fig):
            path_to_fig = os.path.join(sf.output_dir, save_fig)
        logging.info("Output path: %s" % path_to_fig)
        plt.savefig(path_to_fig, facecolor=background_color)
    return fig, axes


def _plot_raw_data(sf, ax, attribute, node_xy, foreground_color, background_color):
    """Size-scaled pos/neg raw-value markers with legend (safe.py:1147-1199)."""
    with np.errstate(divide="ignore", invalid="ignore"):
        s_zero, s_min, s_max = 5, 5, 55
        n = sf.node2attribute[:, attribute]
        n2a = np.abs(n)
        if set(np.unique(n2a[~np.isnan(n2a)])).issubset([0, 1]):
            s = np.zeros(len(n2a))
            s[n2a > 0] = s_max
            n_min, n_max = 0, 1
        else:
            n_min, n_max = np.nanpercentile(np.unique(n2a), [5, 95])
            a = (s_max - s_min) / (n_max - n_min)
            b = s_min - a * n_min
            s = np.clip(a * n2a + b, s_min, s_max)

        neg_color, pos_color, zero_color = "#ff1d23", "#00ff44", foreground_color

        for sel, color, size in (((n < 0), neg_color, None),
                                 ((n > 0), pos_color, None),
                                 ((n == 0), zero_color, s_zero)):
            sizes = s[sel] if size is None else size
            ax.scatter(node_xy[sel, 0], node_xy[sel, 1], s=sizes, c=color,
                       marker=".")

        handles = [plt.scatter([], [], s=s_max, c=pos_color, edgecolors="none"),
                   plt.scatter([], [], s=s_min, c=pos_color, edgecolors="none"),
                   plt.scatter([], [], s=s_zero, c=zero_color, edgecolors="none"),
                   plt.scatter([], [], s=s_min, c=neg_color, edgecolors="none"),
                   plt.scatter([], [], s=s_max, c=neg_color, edgecolors="none")]
        legend_labels = ["{0:.2f}".format(v)
                         for v in [n_max, n_min, 0, -n_min, -n_max]]
        leg = ax.legend(handles, legend_labels, loc="upper left",
                        bbox_to_anchor=(0, 1), title="Raw data", scatterpoints=1,
                        fancybox=False, facecolor=background_color,
                        edgecolor=background_color)
        for leg_txt in leg.get_texts():
            leg_txt.set_color(foreground_color)
        leg.get_title().set_color(foreground_color)
