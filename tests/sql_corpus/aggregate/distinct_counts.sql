-- groups: aggregate; tables: orders; ignoreOrder: false
SELECT o_orderstatus,
       count(DISTINCT o_orderpriority) AS n_prio,
       approx_distinct(o_custkey) >= 1 AS has_customers
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
